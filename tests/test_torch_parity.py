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

_REF_ROOTS = [REF] + [os.path.join(REF, "DCVC-family", d)
                      for d in ("DCVC-FM", "DCVC-HEM", "DCVC-DC",
                                "DCVC-TCM", "DCVC", "EVC")]


def _use_ref_tree(subdir=None):
    """Make exactly ONE reference tree's `src` importable.  The family
    codecs each ship their own top-level `src` namespace package, so the
    previously imported one must be purged and the other roots removed
    from sys.path (a namespace package would otherwise merge them)."""
    root = REF if subdir is None else os.path.join(REF, subdir)
    # family trees import pytorch_msssim (absent here) at module level —
    # a training-loss dependency irrelevant to the forward math
    if "torchvision" not in sys.modules:
        import types
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")

        class _Stub:
            def __init__(self, *a, **k):
                pass

            def __call__(self, *a, **k):
                raise NotImplementedError("stubbed in tests")

        tvt.ToPILImage = _Stub
        tvt.ToTensor = _Stub
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
    if "pytorch_msssim" not in sys.modules:
        import types
        fake = types.ModuleType("pytorch_msssim")

        class MS_SSIM:
            def __init__(self, *a, **k):
                pass

            def __call__(self, *a, **k):
                raise NotImplementedError("stubbed in tests")

        fake.MS_SSIM = MS_SSIM
        sys.modules["pytorch_msssim"] = fake
    for k in list(sys.modules):
        if k == "src" or k.startswith("src."):
            del sys.modules[k]
    for r in _REF_ROOTS:
        while r in sys.path:
            sys.path.remove(r)
    sys.path.insert(0, root)
    return root


@pytest.fixture(scope="module")
def torch_ref():
    torch = pytest.importorskip("torch")
    _use_ref_tree()
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


def test_dmc_parity_with_reference_torch(torch_ref):
    """P-frame compress-path numerics vs the reference DMC
    (reference src/models/video_model.py:299-341): z-plane exact,
    encoder tower + recon within fp tolerance, stream roundtrip."""
    torch, _ = torch_ref
    _use_ref_tree()
    import jax.numpy as jnp
    from src.models.video_model import DMC as TorchDMC
    from opendcvc_tpu.models.dmc import DMC
    from opendcvc_tpu.models import dmc as M
    from opendcvc_tpu.utils.port_torch import port_dmc

    torch.manual_seed(11)
    tnet = TorchDMC()
    with torch.no_grad():
        for qb in (tnet.q_encoder, tnet.q_decoder, tnet.q_feature,
                   tnet.q_recon):
            qb.mul_(torch.rand_like(qb) * 0.5 + 0.75)
        # shrink encoder output so symbols stay in the coded range
        tnet.q_encoder.mul_(0.3)
    tnet.eval()

    qp = 21
    rng = np.random.default_rng(5)
    x_np = rng.random((1, 64, 96, 3), dtype=np.float32)
    ref_np = rng.random((1, 64, 96, 3), dtype=np.float32)

    # ---- reference compress math (pure torch fallbacks, CPU) ----
    with torch.no_grad():
        x_t = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        ref_t = torch.from_numpy(ref_np.transpose(0, 3, 1, 2))
        tnet.clear_dpb()
        tnet.set_curr_poc(0)
        tnet.add_ref_frame(frame=ref_t)
        q_encoder = tnet.q_encoder[qp:qp + 1]
        q_decoder = tnet.q_decoder[qp:qp + 1]
        q_feature = tnet.q_feature[qp:qp + 1]
        q_recon = tnet.q_recon[qp:qp + 1]
        feat_t = tnet.apply_feature_adaptor()
        ctx_txt, ctx_t_t = tnet.feature_extractor(feat_t, q_feature)
        y_t = tnet.encoder(x_t, ctx_txt, q_encoder)
        z_t = tnet.hyper_encoder(tnet.pad_for_y(y_t))
        z_hat_t = torch.round(z_t)
        params_t = tnet.res_prior_param_decoder(z_hat_t, ctx_t_t)
        out = tnet.compress_prior_2x(y_t, params_t, tnet.y_spatial_prior)
        y_hat_t = out[-1]
        feat_out_t = tnet.decoder(y_hat_t, ctx_txt, q_decoder)
        x_hat_t = tnet.recon_generation_net(feat_out_t, q_recon)
        x_hat_t = x_hat_t.clamp(0, 1)

    # ---- this framework, same weights ----
    net = DMC()
    net.load_params(port_dmc(tnet.state_dict()))
    net.update()
    p = net.params

    qp_j = np.int32(qp)
    ref_j = jnp.asarray(ref_np)
    feat_j = M._stage_adaptor_i(p, ref_j)
    x1_j, ctx_t_j = M._stage_fe_part1(p, feat_j, qp_j)
    ctx_j = M._stage_fe_part2(p, x1_j)
    y_j, z_hat_j, _ = M._stage_encode_y(p, jnp.asarray(x_np), ctx_j,
                                        qp_j)

    y_ref = _t2j(y_t)
    assert np.max(np.abs(np.asarray(y_j) - y_ref)) < 5e-3, \
        np.max(np.abs(np.asarray(y_j) - y_ref))
    # hyperprior integer plane agrees exactly
    assert np.array_equal(np.asarray(z_hat_j), _t2j(z_hat_t))

    # full compress (entropy coding included), recon vs torch oracle
    net.clear_dpb()
    net.set_curr_poc(0)
    net.add_ref_frame(None, ref_j)
    enc = net.compress(x_np, qp)
    assert len(enc["bit_stream"]) > 0
    enc_feature = np.asarray(net.dpb[0].feature, np.float32)
    feat_ref = _t2j(feat_out_t)
    fdiff = np.abs(enc_feature - feat_ref)
    assert np.mean(fdiff) < 1e-3 and np.percentile(fdiff, 99.9) < 2e-2, \
        (float(np.mean(fdiff)), float(np.max(fdiff)))

    # decoder side: bit-exact feature chain vs our encoder, recon close
    # to the torch oracle
    d_net = DMC()
    d_net.load_params(p)
    d_net.update()
    d_net.clear_dpb()
    d_net.set_curr_poc(0)
    d_net.add_ref_frame(None, ref_j)
    sps = {"sps_id": 0, "height": 64, "width": 96, "ec_part": 0,
           "use_ada_i": 0}
    dec = d_net.decompress(enc["bit_stream"], sps, qp)
    assert np.array_equal(np.asarray(d_net.dpb[0].feature, np.float32),
                          enc_feature)
    rdiff = np.abs(np.asarray(dec["x_hat"], np.float32) - _t2j(x_hat_t))
    assert np.mean(rdiff) < 1e-3 and np.percentile(rdiff, 99.9) < 2e-2, \
        (float(np.mean(rdiff)), float(np.max(rdiff)))


def test_dmc_port_shapes(torch_ref):
    """The video-model porter maps every reference parameter (no keys
    missed, every tensor lands with transposed shape)."""
    torch, _ = torch_ref
    _use_ref_tree()
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


def test_dmc_fm_parity_with_reference_torch():
    """DCVC-FM motion + contextual path numerics vs the reference
    (reference DCVC-family/DCVC-FM/src/models/video_model.py): SpyNet
    flow, motion compensation (warp + OffsetDiversity + fusion),
    contextual enc/dec, recon — all with ported weights."""
    torch = pytest.importorskip("torch")
    os.environ.setdefault("SUPPRESS_CUSTOM_KERNEL_WARNING", "1")
    _use_ref_tree("DCVC-family/DCVC-FM")
    from src.models.video_model import DMC as TorchFM
    import jax.numpy as jnp
    from opendcvc_tpu.layers import blocks_fm as FMB
    from opendcvc_tpu.models import dmc_fm as M
    from opendcvc_tpu.models.dmc_fm import DMCFM
    from opendcvc_tpu.utils.port_torch import port_dmc_fm

    torch.manual_seed(3)
    tnet = TorchFM()
    with torch.no_grad():
        for qb in (tnet.mv_y_q_enc, tnet.mv_y_q_dec,
                   tnet.y_q_enc, tnet.y_q_dec):
            qb.copy_(torch.tensor([0.6, 1.8]).reshape(2, 1, 1, 1))
    tnet.eval()

    q_index = 32
    rng = np.random.default_rng(9)
    x_np = rng.random((1, 64, 64, 3), dtype=np.float32)
    ref_np = rng.random((1, 64, 64, 3), dtype=np.float32)

    with torch.no_grad():
        x_t = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        ref_t = torch.from_numpy(ref_np.transpose(0, 3, 1, 2))
        dpb_t = {"ref_frame": ref_t, "ref_feature": None,
                 "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}
        flow_t = tnet.optic_flow(x_t, ref_t)
        c1_t, c2_t, c3_t, warp_t = tnet.motion_compensation(
            dpb_t, flow_t, 0)
        q_enc_t = tnet.get_curr_q(tnet.y_q_enc, q_index)
        q_dec_t = tnet.get_curr_q(tnet.y_q_dec, q_index)
        y_t = tnet.contextual_encoder(x_t, c1_t, c2_t, c3_t, q_enc_t)
        y_pad_t, slice_shape = tnet.pad_for_y(y_t)
        z_t = tnet.contextual_hyper_prior_encoder(y_pad_t)
        z_hat_t = torch.round(z_t)
        params_t = tnet.contextual_prior_param_decoder(
            z_hat_t, dpb_t, c3_t, slice_shape)
        y_hat_t = torch.round(y_t)
        res_t = tnet.contextual_decoder(y_hat_t, c2_t, c3_t, q_dec_t)
        feat_t, recon_t = tnet.recon_generation_net(res_t, c1_t)
        recon_t = recon_t.clamp(0, 1)

    net = DMCFM()
    net.load_params(port_dmc_fm(tnet.state_dict()))
    p = net.params

    x_j = jnp.asarray(x_np)
    ref_j = jnp.asarray(ref_np)
    flow_j = FMB.spynet_apply(p["optic_flow"], x_j, ref_j)
    fdiff = np.abs(np.asarray(flow_j) - _t2j(flow_t))
    assert np.max(fdiff) < 2e-3, float(np.max(fdiff))

    c1_j, c2_j, c3_j, warp_j = M._stage_motion_comp(
        p, flow_j, ref_j, None, 0)
    for ours, ref in ((c1_j, c1_t), (c2_j, c2_t), (c3_j, c3_t),
                      (warp_j, warp_t)):
        d = np.abs(np.asarray(ours) - _t2j(ref))
        assert np.max(d) < 5e-3, float(np.max(d))

    y_j, z_hat_j, _ = M._stage_ctx_enc(p, x_j, c1_j, c2_j, c3_j, q_index)
    ydiff = np.abs(np.asarray(y_j) - _t2j(y_t))
    assert np.max(ydiff) < 5e-3, float(np.max(ydiff))
    # integer hyper plane: identical up to rare rounding-boundary flips
    zh_j = np.asarray(z_hat_j)
    zh_t = _t2j(z_hat_t)
    assert np.mean(zh_j != zh_t) < 1e-3, float(np.mean(zh_j != zh_t))

    params_j = M._stage_ctx_prior(p, jnp.asarray(zh_t), c3_j, None,
                                  y_j.shape[1], y_j.shape[2])
    pdiff = np.abs(np.asarray(params_j) - _t2j(params_t))
    assert np.max(pdiff) < 5e-3, float(np.max(pdiff))

    x_hat_j, feat_j = M._stage_recon(p, jnp.asarray(_t2j(y_hat_t)),
                                     c1_j, c2_j, c3_j, q_index)
    rdiff = np.abs(np.asarray(x_hat_j) - _t2j(recon_t))
    assert np.mean(rdiff) < 1e-3 and np.percentile(rdiff, 99.9) < 2e-2, \
        (float(np.mean(rdiff)), float(np.max(rdiff)))


def test_dmc_fm_port_shapes():
    """The FM porter consumes every reference parameter and reproduces
    our init tree's shapes exactly."""
    torch = pytest.importorskip("torch")
    os.environ.setdefault("SUPPRESS_CUSTOM_KERNEL_WARNING", "1")
    _use_ref_tree("DCVC-family/DCVC-FM")
    from src.models.video_model import DMC as TorchFM
    import jax
    from opendcvc_tpu.models.dmc_fm import DMCFM
    from opendcvc_tpu.utils.port_torch import port_dmc_fm

    torch.manual_seed(4)
    tnet = TorchFM()
    ported = port_dmc_fm(tnet.state_dict())

    net = DMCFM()
    net.init_params(seed=0)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(ported)
    flat_o, _ = jax.tree_util.tree_flatten_with_path(net.params)
    shapes_p = {jax.tree_util.keystr(k): v.shape for k, v in flat_p}
    shapes_o = {jax.tree_util.keystr(k): v.shape for k, v in flat_o}
    assert shapes_p == shapes_o, (
        sorted(set(shapes_o) - set(shapes_p))[:5],
        sorted(set(shapes_p) - set(shapes_o))[:5],
        [k for k in shapes_p if k in shapes_o
         and shapes_p[k] != shapes_o[k]][:5])
    assert len(flat_p) == len(tnet.state_dict())


def test_dmc_hem_parity_with_reference_torch():
    """DCVC-HEM path numerics vs the reference (reference
    DCVC-family/DCVC-HEM/src/models/video_model.py:260-321): SpyNet
    (moduleBasic 7x7 variant), mv enc/dec towers, hyper towers, prior
    fusion, motion compensation, contextual enc/dec, UNet recon."""
    torch = pytest.importorskip("torch")
    _use_ref_tree("DCVC-family/DCVC-HEM")
    from src.models.video_model import DMC as TorchHEM
    import jax.numpy as jnp
    from opendcvc_tpu.models import dmc_hem as M
    from opendcvc_tpu.models.dmc_hem import DMCHEM, _q_vec
    from opendcvc_tpu.utils.port_torch import port_dmc_hem

    torch.manual_seed(6)
    tnet = TorchHEM()
    tnet.eval()
    mv_scale, y_scale = 1.2, 0.8

    rng = np.random.default_rng(13)
    x_np = rng.random((1, 64, 64, 3), dtype=np.float32)
    ref_np = rng.random((1, 64, 64, 3), dtype=np.float32)

    with torch.no_grad():
        x_t = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        ref_t = torch.from_numpy(ref_np.transpose(0, 3, 1, 2))
        curr_mv_y_q = tnet.get_curr_mv_y_q(mv_scale)
        curr_y_q = tnet.get_curr_y_q(y_scale)
        est_mv_t = tnet.optic_flow(x_t, ref_t)
        mv_y_t = tnet.mv_encoder(est_mv_t) / curr_mv_y_q
        mv_z_t = tnet.mv_hyper_prior_encoder(mv_y_t)
        mv_z_hat_t = torch.round(mv_z_t)
        mv_params_t = tnet.mv_hyper_prior_decoder(mv_z_hat_t)
        mv_params_t = torch.cat((mv_params_t,
                                 torch.zeros_like(mv_y_t)), dim=1)
        mv_q_step_t, mv_scales_t, mv_means_t = \
            tnet.mv_y_prior_fusion(mv_params_t).chunk(3, 1)
        mv_y_hat_t = torch.round(mv_y_t)  # prior passes checked separately
        mv_hat_t = tnet.mv_decoder(mv_y_hat_t * curr_mv_y_q)
        dpb_t = {"ref_frame": ref_t, "ref_feature": None,
                 "ref_y": None, "ref_mv_y": None}
        c1_t, c2_t, c3_t, warp_t = tnet.motion_compensation(dpb_t, mv_hat_t)
        y_t = tnet.contextual_encoder(x_t, c1_t, c2_t, c3_t) / curr_y_q
        z_t = tnet.contextual_hyper_prior_encoder(y_t)
        z_hat_t = torch.round(z_t)
        hier_t = tnet.contextual_hyper_prior_decoder(z_hat_t)
        temporal_t = tnet.temporal_prior_encoder(c3_t)
        params_t = torch.cat((temporal_t, hier_t,
                              torch.zeros_like(y_t)), dim=1)
        q_step_t, scales_t, means_t = \
            tnet.y_prior_fusion(params_t).chunk(3, 1)
        y_hat_t = torch.round(y_t)
        res_t = tnet.contextual_decoder(y_hat_t * curr_y_q, c2_t, c3_t)
        feat_t, recon_t = tnet.recon_generation_net(res_t, c1_t)
        recon_t = recon_t.clamp(0, 1)

    net = DMCHEM()
    net.load_params(port_dmc_hem(tnet.state_dict()))
    p = net.params

    x_j = jnp.asarray(x_np)
    ref_j = jnp.asarray(ref_np)
    mv_q = _q_vec(p["mv_y_q_basic"], mv_scale, jnp.float32)
    y_q = _q_vec(p["y_q_basic"], y_scale, jnp.float32)

    mv_y_j, mv_z_hat_j, _ = M._stage_mv_enc(p, x_j, ref_j, mv_q)
    d = np.abs(np.asarray(mv_y_j) - _t2j(mv_y_t))
    assert np.max(d) < 5e-3, float(np.max(d))
    zh_j, zh_t = np.asarray(mv_z_hat_j), _t2j(mv_z_hat_t)
    assert np.mean(zh_j != zh_t) < 1e-3

    q_j, s_j, m_j = M._stage_mv_prior(p, jnp.asarray(zh_t),
                                      jnp.zeros_like(mv_y_j))
    # reference clamps q_step inside the dual-prior driver; ours at the
    # fusion output — compare the clamped value
    d = np.abs(np.asarray(q_j)
               - np.maximum(_t2j(mv_q_step_t), 0.5))
    assert np.max(d) < 5e-3, float(np.max(d))
    for ours, ref in ((s_j, mv_scales_t), (m_j, mv_means_t)):
        d = np.abs(np.asarray(ours) - _t2j(ref))
        assert np.max(d) < 5e-3, float(np.max(d))

    mv_hat_j = M._stage_mv_dec(p, jnp.asarray(_t2j(mv_y_hat_t)) * mv_q)
    d = np.abs(np.asarray(mv_hat_j) - _t2j(mv_hat_t))
    assert np.max(d) < 5e-3, float(np.max(d))

    c1_j, c2_j, c3_j, warp_j = M._stage_motion_comp(
        p, jnp.asarray(_t2j(mv_hat_t)), ref_j, None)
    for ours, ref in ((c1_j, c1_t), (c2_j, c2_t), (c3_j, c3_t),
                      (warp_j, warp_t)):
        d = np.abs(np.asarray(ours) - _t2j(ref))
        assert np.max(d) < 5e-3, float(np.max(d))

    y_j, z_hat_j, _ = M._stage_ctx_enc(p, x_j, c1_j, c2_j, c3_j, y_q)
    d = np.abs(np.asarray(y_j) - _t2j(y_t))
    assert np.max(d) < 5e-3, float(np.max(d))
    zh_j, zh_t = np.asarray(z_hat_j), _t2j(z_hat_t)
    assert np.mean(zh_j != zh_t) < 1e-3

    q_j, s_j, m_j = M._stage_ctx_prior(p, jnp.asarray(zh_t), c3_j,
                                       jnp.zeros_like(y_j))
    d = np.abs(np.asarray(q_j) - np.maximum(_t2j(q_step_t), 0.5))
    assert np.max(d) < 5e-3, float(np.max(d))

    feat_j, x_hat_j = M._stage_recon(
        p, jnp.asarray(_t2j(y_hat_t)) * y_q, c1_j, c2_j, c3_j)
    d = np.abs(np.asarray(x_hat_j) - _t2j(recon_t))
    assert np.mean(d) < 1e-3 and np.percentile(d, 99.9) < 2e-2, \
        (float(np.mean(d)), float(np.max(d)))


def test_dmc_hem_port_shapes():
    torch = pytest.importorskip("torch")
    _use_ref_tree("DCVC-family/DCVC-HEM")
    from src.models.video_model import DMC as TorchHEM
    import jax
    from opendcvc_tpu.models.dmc_hem import DMCHEM
    from opendcvc_tpu.utils.port_torch import port_dmc_hem

    torch.manual_seed(8)
    tnet = TorchHEM()
    ported = port_dmc_hem(tnet.state_dict())

    net = DMCHEM()
    net.init_params(seed=0)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(ported)
    flat_o, _ = jax.tree_util.tree_flatten_with_path(net.params)
    shapes_p = {jax.tree_util.keystr(k): v.shape for k, v in flat_p}
    shapes_o = {jax.tree_util.keystr(k): v.shape for k, v in flat_o}
    assert shapes_p == shapes_o, (
        sorted(set(shapes_o) - set(shapes_p))[:5],
        sorted(set(shapes_p) - set(shapes_o))[:5],
        [k for k in shapes_p if k in shapes_o
         and shapes_p[k] != shapes_o[k]][:5])
    assert len(flat_p) == len(tnet.state_dict())


def test_dmc_tcm_parity_with_reference_torch():
    """DCVC-TCM numerics vs the reference (reference
    DCVC-family/DCVC-TCM/src/models/video_net_dmc.py): SpyNet, GDN
    mv enc/dec towers (incl. ConvTranspose2d porting), motion
    compensation, contextual enc, hyper + temporal priors, entropy
    parameters, recon."""
    torch = pytest.importorskip("torch")
    _use_ref_tree("DCVC-family/DCVC-TCM")
    from src.models.video_net_dmc import DMC as TorchTCM
    import jax.numpy as jnp
    from opendcvc_tpu.models import dmc_tcm as M
    from opendcvc_tpu.models.dmc_tcm import DMCTCM
    from opendcvc_tpu.utils.port_torch import port_dmc_tcm

    torch.manual_seed(2)
    tnet = TorchTCM()
    tnet.eval()

    rng = np.random.default_rng(21)
    x_np = rng.random((1, 64, 64, 3), dtype=np.float32)
    ref_np = rng.random((1, 64, 64, 3), dtype=np.float32)

    with torch.no_grad():
        x_t = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        ref_t = torch.from_numpy(ref_np.transpose(0, 3, 1, 2))
        flow_t = tnet.optic_flow(x_t, ref_t)
        mv_y_t = tnet.mv_encoder(flow_t)
        mv_z_t = tnet.mv_prior_encoder(mv_y_t)
        mv_z_hat_t = torch.round(mv_z_t)
        mv_params_t = tnet.mv_prior_decoder(mv_z_hat_t)
        mv_y_hat_t = torch.round(mv_y_t)
        mv_hat_t = tnet.mv_decoder(mv_y_hat_t)
        c1_t, c2_t, c3_t, warp_t = tnet.motion_compensation(
            ref_t, None, mv_hat_t)
        y_t = tnet.contextual_encoder(x_t, c1_t, c2_t, c3_t)
        z_t = tnet.contextual_hyper_prior_encoder(y_t)
        z_hat_t = torch.round(z_t)
        hier_t = tnet.contextual_hyper_prior_decoder(z_hat_t)
        temporal_t = tnet.temporal_prior_encoder(c1_t, c2_t, c3_t)
        gp_t = tnet.contextual_entropy_parameter(
            torch.cat((temporal_t, hier_t), dim=1))
        y_hat_t = torch.round(y_t)
        res_t = tnet.contextual_decoder(y_hat_t, c2_t, c3_t)
        feat_t, recon_t = tnet.recon_generation_net(res_t, c1_t)
        recon_t = recon_t.clamp(0, 1)

    net = DMCTCM()
    net.load_params(port_dmc_tcm(tnet.state_dict()))
    p = net.params

    x_j = jnp.asarray(x_np)
    ref_j = jnp.asarray(ref_np)
    mv_y_j, mv_z_hat_j, _ = M._stage_mv_enc(p, x_j, ref_j)
    d = np.abs(np.asarray(mv_y_j) - _t2j(mv_y_t))
    assert np.max(d) < 5e-3, float(np.max(d))
    zh_j, zh_t = np.asarray(mv_z_hat_j), _t2j(mv_z_hat_t)
    assert np.mean(zh_j != zh_t) < 1e-3

    scales_j, means_j = M._stage_mv_params(p, jnp.asarray(zh_t))
    mp_ref = _t2j(mv_params_t)
    got = np.concatenate([np.asarray(scales_j), np.asarray(means_j)], -1)
    d = np.abs(got - mp_ref)
    assert np.max(d) < 5e-3, float(np.max(d))

    mv_hat_j = M._stage_mv_dec(p, jnp.asarray(_t2j(mv_y_hat_t)))
    d = np.abs(np.asarray(mv_hat_j) - _t2j(mv_hat_t))
    assert np.max(d) < 5e-3, float(np.max(d))

    c1_j, c2_j, c3_j, warp_j = M._stage_motion_comp(
        p, jnp.asarray(_t2j(mv_hat_t)), ref_j, None)
    for ours, ref in ((c1_j, c1_t), (c2_j, c2_t), (c3_j, c3_t),
                      (warp_j, warp_t)):
        d = np.abs(np.asarray(ours) - _t2j(ref))
        assert np.max(d) < 5e-3, float(np.max(d))

    y_j, z_hat_j, _ = M._stage_ctx_enc(p, x_j, c1_j, c2_j, c3_j)
    d = np.abs(np.asarray(y_j) - _t2j(y_t))
    assert np.max(d) < 5e-3, float(np.max(d))

    scales_j, means_j = M._stage_y_params(p, jnp.asarray(_t2j(z_hat_t)),
                                          c1_j, c2_j, c3_j)
    gp_ref = _t2j(gp_t)
    got = np.concatenate([np.asarray(scales_j), np.asarray(means_j)], -1)
    d = np.abs(got - gp_ref)
    assert np.max(d) < 5e-3, float(np.max(d))

    feat_j, x_hat_j = M._stage_recon(p, jnp.asarray(_t2j(y_hat_t)),
                                     c1_j, c2_j, c3_j)
    d = np.abs(np.asarray(x_hat_j) - _t2j(recon_t))
    assert np.mean(d) < 1e-3 and np.percentile(d, 99.9) < 2e-2, \
        (float(np.mean(d)), float(np.max(d)))


def test_dmc_tcm_port_shapes():
    torch = pytest.importorskip("torch")
    _use_ref_tree("DCVC-family/DCVC-TCM")
    from src.models.video_net_dmc import DMC as TorchTCM
    import jax
    from opendcvc_tpu.models.dmc_tcm import DMCTCM
    from opendcvc_tpu.utils.port_torch import port_dmc_tcm

    torch.manual_seed(5)
    tnet = TorchTCM()
    ported = port_dmc_tcm(tnet.state_dict())
    net = DMCTCM()
    net.init_params(seed=0)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(ported)
    flat_o, _ = jax.tree_util.tree_flatten_with_path(net.params)
    shapes_p = {jax.tree_util.keystr(k): v.shape for k, v in flat_p}
    shapes_o = {jax.tree_util.keystr(k): v.shape for k, v in flat_o}
    assert shapes_p == shapes_o, (
        sorted(set(shapes_o) - set(shapes_p))[:5],
        sorted(set(shapes_p) - set(shapes_o))[:5],
        [k for k in shapes_p if k in shapes_o
         and shapes_p[k] != shapes_o[k]][:5])
    assert len(flat_p) == len(tnet.state_dict())


def test_dmc_dc_port_shapes():
    torch = pytest.importorskip("torch")
    _use_ref_tree("DCVC-family/DCVC-DC")
    from src.models.video_model import DMC as TorchDC
    import jax
    from opendcvc_tpu.models.dmc_dc import DMCDC
    from opendcvc_tpu.utils.port_torch import port_dmc_dc

    torch.manual_seed(9)
    tnet = TorchDC()
    ported = port_dmc_dc(tnet.state_dict())
    net = DMCDC()
    net.init_params(seed=0)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(ported)
    flat_o, _ = jax.tree_util.tree_flatten_with_path(net.params)
    shapes_p = {jax.tree_util.keystr(k): v.shape for k, v in flat_p}
    shapes_o = {jax.tree_util.keystr(k): v.shape for k, v in flat_o}
    assert shapes_p == shapes_o, (
        sorted(set(shapes_o) - set(shapes_p))[:5],
        sorted(set(shapes_p) - set(shapes_o))[:5],
        [k for k in shapes_p if k in shapes_o
         and shapes_p[k] != shapes_o[k]][:8])
    assert len(flat_p) == len(tnet.state_dict())


def test_dmc_dc_parity_with_reference_torch():
    """DCVC-DC numerics vs the reference (reference
    DCVC-family/DCVC-DC/src/models/video_model.py:425-471): SpyNet,
    mv enc/dec, OffsetDiversity motion compensation, contextual enc,
    hyper + temporal priors, UNet recon — with enc/dec-separate quant
    anchors."""
    torch = pytest.importorskip("torch")
    os.environ.setdefault("SUPPRESS_CUSTOM_KERNEL_WARNING", "1")
    _use_ref_tree("DCVC-family/DCVC-DC")
    from src.models.video_model import DMC as TorchDC
    import jax.numpy as jnp
    from opendcvc_tpu.models import dmc_dc as M
    from opendcvc_tpu.models.dmc_dc import DMCDC
    from opendcvc_tpu.utils.port_torch import port_dmc_dc

    torch.manual_seed(14)
    tnet = TorchDC()
    tnet.eval()
    q_index = 2

    rng = np.random.default_rng(33)
    x_np = rng.random((1, 64, 64, 3), dtype=np.float32)
    ref_np = rng.random((1, 64, 64, 3), dtype=np.float32)

    with torch.no_grad():
        x_t = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        ref_t = torch.from_numpy(ref_np.transpose(0, 3, 1, 2))
        dpb_t = {"ref_frame": ref_t, "ref_feature": None,
                 "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}
        mv_q_enc_t, mv_q_dec_t, y_q_enc_t, y_q_dec_t = \
            tnet.get_q_for_inference(True, q_index)
        mv_y_t = tnet.motion_estimation_and_mv_encoding(
            x_t, dpb_t, mv_q_enc_t)
        mv_y_pad_t, mv_slice = tnet.pad_for_y(mv_y_t)
        mv_z_t = tnet.mv_hyper_prior_encoder(mv_y_pad_t)
        mv_z_hat_t = torch.round(mv_z_t)
        mv_params_t = tnet.mv_prior_param_decoder(mv_z_hat_t, dpb_t,
                                                  mv_slice)
        mv_y_hat_t = torch.round(mv_y_t)
        mv_hat_t, mv_feat_t = tnet.mv_decoder(mv_y_hat_t, mv_q_dec_t)
        c1_t, c2_t, c3_t, warp_t = tnet.motion_compensation(
            dpb_t, mv_hat_t, 0)
        y_t = tnet.contextual_encoder(x_t, c1_t, c2_t, c3_t, y_q_enc_t)
        y_pad_t, y_slice = tnet.pad_for_y(y_t)
        z_t = tnet.contextual_hyper_prior_encoder(y_pad_t)
        z_hat_t = torch.round(z_t)
        params_t = tnet.res_prior_param_decoder(z_hat_t, dpb_t, c3_t,
                                                y_slice)
        y_hat_t = torch.round(y_t)
        x_hat_t, feat_t = tnet.get_recon_and_feature(
            y_hat_t, c1_t, c2_t, c3_t, y_q_dec_t)

    net = DMCDC()
    net.load_params(port_dmc_dc(tnet.state_dict()))
    p = net.params
    mv_q_enc, mv_q_dec, y_q_enc, y_q_dec = net.get_q_for_inference(
        True, q_index)

    x_j = jnp.asarray(x_np)
    ref_j = jnp.asarray(ref_np)
    mv_y_j, mv_z_hat_j, _ = M._stage_mv_enc(p, x_j, ref_j, None,
                                            mv_q_enc)
    d = np.abs(np.asarray(mv_y_j) - _t2j(mv_y_t))
    assert np.max(d) < 5e-3, float(np.max(d))
    zh_j, zh_t = np.asarray(mv_z_hat_j), _t2j(mv_z_hat_t)
    assert np.mean(zh_j != zh_t) < 1e-3

    mv_hat_j, mv_feat_j = M.mv_decoder(p, jnp.asarray(_t2j(mv_y_hat_t)),
                                       mv_q_dec)
    d = np.abs(np.asarray(mv_hat_j) - _t2j(mv_hat_t))
    assert np.max(d) < 5e-3, float(np.max(d))

    c1_j, c2_j, c3_j, warp_j = M._stage_motion_comp(
        p, jnp.asarray(_t2j(mv_hat_t)), ref_j, None, 0)
    for ours, ref in ((c1_j, c1_t), (c2_j, c2_t), (c3_j, c3_t),
                      (warp_j, warp_t)):
        d = np.abs(np.asarray(ours) - _t2j(ref))
        assert np.max(d) < 5e-3, float(np.max(d))

    y_j, z_hat_j, _ = M._stage_ctx_enc(p, x_j, c1_j, c2_j, c3_j, y_q_enc)
    d = np.abs(np.asarray(y_j) - _t2j(y_t))
    assert np.max(d) < 5e-3, float(np.max(d))

    x_hat_j, feat_j = M._stage_recon(p, jnp.asarray(_t2j(y_hat_t)),
                                     c1_j, c2_j, c3_j, y_q_dec)
    d = np.abs(np.asarray(x_hat_j) - _t2j(x_hat_t))
    assert np.mean(d) < 1e-3 and np.percentile(d, 99.9) < 2e-2, \
        (float(np.mean(d)), float(np.max(d)))


def test_dcvc_port_shapes():
    torch = pytest.importorskip("torch")
    _use_ref_tree("DCVC-family/DCVC")
    from src.models.DCVC_net import DCVC_net as TorchDCVC
    import jax
    from opendcvc_tpu.models.dcvc import DCVCNet
    from opendcvc_tpu.utils.port_torch import port_dcvc

    torch.manual_seed(3)
    tnet = TorchDCVC()
    ported = port_dcvc(tnet.state_dict())
    net = DCVCNet()
    net.init_params(seed=0)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(ported)
    flat_o, _ = jax.tree_util.tree_flatten_with_path(net.params)
    shapes_p = {jax.tree_util.keystr(k): v.shape for k, v in flat_p}
    shapes_o = {jax.tree_util.keystr(k): v.shape for k, v in flat_o}
    assert shapes_p == shapes_o, (
        sorted(set(shapes_o) - set(shapes_p))[:5],
        sorted(set(shapes_p) - set(shapes_o))[:5],
        [k for k in shapes_p if k in shapes_o
         and shapes_p[k] != shapes_o[k]][:8])
    assert len(flat_p) == len(tnet.state_dict())


def test_dcvc_parity_with_reference_torch():
    """DCVC (NeurIPS'21) numerics vs the reference DCVC_net: SpyNet,
    GDN mv enc/dec (ConvTranspose2d), mv refinement, feature-domain
    motion compensation, contextual enc/dec, hyper priors, masked-conv
    AR context + entropy parameters."""
    torch = pytest.importorskip("torch")
    _use_ref_tree("DCVC-family/DCVC")
    from src.models.DCVC_net import DCVC_net as TorchDCVC
    import jax.numpy as jnp
    from opendcvc_tpu.models import dcvc as M
    from opendcvc_tpu.models.dcvc import DCVCNet
    from opendcvc_tpu.utils.port_torch import port_dcvc

    torch.manual_seed(7)
    tnet = TorchDCVC()
    tnet.eval()

    rng = np.random.default_rng(41)
    x_np = rng.random((1, 64, 64, 3), dtype=np.float32)
    ref_np = rng.random((1, 64, 64, 3), dtype=np.float32)

    with torch.no_grad():
        x_t = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        ref_t = torch.from_numpy(ref_np.transpose(0, 3, 1, 2))
        flow_t = tnet.opticFlow(x_t, ref_t)
        mv_y_t = tnet.mvEncoder(flow_t)
        mv_z_t = tnet.mvpriorEncoder(mv_y_t)
        mv_z_hat_t = torch.round(mv_z_t)
        mv_params_t = tnet.mvpriorDecoder(mv_z_hat_t)
        mv_y_hat_t = torch.round(mv_y_t)
        mv_up_t = tnet.mvDecoder_part1(mv_y_hat_t)
        mv_ref_t = tnet.mv_refine(ref_t, mv_up_t)
        ctx_t = tnet.motioncompensation(ref_t, mv_ref_t)
        y_t = tnet.contextualEncoder(torch.cat((x_t, ctx_t), dim=1))
        z_t = tnet.priorEncoder(y_t)
        z_hat_t = torch.round(z_t)
        hp_t = tnet.priorDecoder(z_hat_t)
        temporal_t = tnet.temporalPriorEncoder(ctx_t)
        y_hat_t = torch.round(y_t)
        ar_t = tnet.auto_regressive(y_hat_t)
        gp_t = tnet.entropy_parameters(
            torch.cat((temporal_t, hp_t, ar_t), dim=1))
        recon_t = tnet.contextualDecoder_part2(torch.cat(
            (tnet.contextualDecoder_part1(y_hat_t), ctx_t), dim=1))
        recon_t = recon_t.clamp(0, 1)

    net = DCVCNet()
    net.load_params(port_dcvc(tnet.state_dict()))
    p = net.params

    x_j = jnp.asarray(x_np)
    ref_j = jnp.asarray(ref_np)
    mv_y_j, mv_z_hat_j, _ = M._stage_mv_front(p, x_j, ref_j)
    d = np.abs(np.asarray(mv_y_j) - _t2j(mv_y_t))
    assert np.max(d) < 5e-3, float(np.max(d))
    zh_j, zh_t = np.asarray(mv_z_hat_j), _t2j(mv_z_hat_t)
    assert np.mean(zh_j != zh_t) < 1e-3

    mp_j = M._stage_mv_prior_params(p, jnp.asarray(zh_t))
    d = np.abs(np.asarray(mp_j) - _t2j(mv_params_t))
    assert np.max(d) < 5e-3, float(np.max(d))

    ctx_j = M._stage_after_mv(p, ref_j, jnp.asarray(_t2j(mv_y_hat_t)))
    d = np.abs(np.asarray(ctx_j) - _t2j(ctx_t))
    assert np.max(d) < 5e-3, float(np.max(d))

    y_j, z_hat_j, _ = M._stage_ctx_front(p, x_j, ctx_j)
    d = np.abs(np.asarray(y_j) - _t2j(y_t))
    assert np.max(d) < 5e-3, float(np.max(d))

    temporal_j = M._stage_temporal(p, ctx_j)
    yp_j = M._stage_y_prior_params(p, jnp.asarray(_t2j(z_hat_t)),
                                   temporal_j)
    # entropy params with the masked-conv AR context
    y_hat_j = jnp.asarray(_t2j(y_hat_t))
    ar_j = M.masked_conv_apply(p["auto_regressive"], y_hat_j)
    gp_j = M.entropy_params_apply(
        p["entropy_parameters"], jnp.concatenate((yp_j, ar_j), axis=-1))
    d = np.abs(np.asarray(gp_j) - _t2j(gp_t))
    assert np.max(d) < 5e-3, float(np.max(d))

    recon_j = M._stage_recon(p, y_hat_j, ctx_j)
    d = np.abs(np.asarray(recon_j) - _t2j(recon_t))
    assert np.mean(d) < 1e-3 and np.percentile(d, 99.9) < 2e-2, \
        (float(np.mean(d)), float(np.max(d)))


def test_evc_parity_with_reference_torch():
    """EVC image codec numerics vs the reference (reference
    DCVC-family/EVC/src/models/image_model.py:30-57): encoder, hyper
    enc/dec + prior fusion, decoder."""
    torch = pytest.importorskip("torch")
    _use_ref_tree("DCVC-family/EVC")
    from src.models.image_model import EVC_LL as TorchEVC
    import jax
    import jax.numpy as jnp
    from opendcvc_tpu.models import evc as M
    from opendcvc_tpu.models.evc import EVC
    from opendcvc_tpu.utils.port_torch import port_evc

    torch.manual_seed(12)
    tnet = TorchEVC()
    tnet.eval()
    q_scale = 1.3

    rng = np.random.default_rng(55)
    x_np = rng.random((1, 64, 64, 3), dtype=np.float32)

    with torch.no_grad():
        x_t = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        _, y_t, curr_q_t = tnet.single_encode(x_t, q_scale)
        z_t = tnet.hyper_enc(y_t)
        z_hat_t = torch.round(z_t)
        params_t = tnet.y_prior_fusion(tnet.hyper_dec(z_hat_t))
        y_hat_t = torch.round(y_t)
        x_hat_t = tnet.dec(y_hat_t * curr_q_t).clamp(0, 1)

    net = EVC()
    net.load_params(port_evc(tnet.state_dict()))
    p = net.params

    # ported tree is complete and shape-exact
    flat_p, _ = jax.tree_util.tree_flatten_with_path(port_evc(
        tnet.state_dict()))
    net2 = EVC()
    net2.init_params(seed=0)
    flat_o, _ = jax.tree_util.tree_flatten_with_path(net2.params)
    shapes_p = {jax.tree_util.keystr(k): v.shape for k, v in flat_p}
    shapes_o = {jax.tree_util.keystr(k): v.shape for k, v in flat_o}
    assert shapes_p == shapes_o, (
        sorted(set(shapes_o) - set(shapes_p))[:5],
        sorted(set(shapes_p) - set(shapes_o))[:5])
    assert len(flat_p) == len(tnet.state_dict())

    x_j = jnp.asarray(x_np)
    y_j, z_hat_j, _ = M._stage_enc_front(p, x_j, q_scale)
    d = np.abs(np.asarray(y_j) - _t2j(y_t))
    assert np.max(d) < 5e-3, float(np.max(d))
    zh_j, zh_t = np.asarray(z_hat_j), _t2j(z_hat_t)
    assert np.mean(zh_j != zh_t) < 1e-3

    q_step_j, scales_j, means_j = M._stage_prior(p, jnp.asarray(zh_t))
    pr = _t2j(params_t)
    c = pr.shape[-1] // 3
    d = np.abs(np.asarray(q_step_j) - np.maximum(pr[..., :c], 0.5))
    assert np.max(d) < 5e-3, float(np.max(d))
    for ours, ref in ((scales_j, pr[..., c:2 * c]),
                      (means_j, pr[..., 2 * c:])):
        d = np.abs(np.asarray(ours) - ref)
        assert np.max(d) < 5e-3, float(np.max(d))

    # recon from the rounded latent (q folded back like the reference)
    y_hat_j = jnp.asarray(_t2j(y_hat_t))
    x_hat_j = M.dec_apply(p["dec"], y_hat_j * M._curr_q(p, q_scale,
                                                       y_hat_j.dtype))
    x_hat_j = jnp.clip(x_hat_j, 0, 1)
    d = np.abs(np.asarray(x_hat_j) - _t2j(x_hat_t))
    assert np.mean(d) < 1e-3 and np.percentile(d, 99.9) < 2e-2, \
        (float(np.mean(d)), float(np.max(d)))
