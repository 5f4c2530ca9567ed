"""Torch-checkpoint porting for the DCVC-RT models.

Maps reference PyTorch state dicts (reference: src/models/image_model.py
and video_model.py parameter names) onto this framework's param pytrees.
Channel orders were chosen to make this mechanical: NCHW->NHWC conv
weights are pure transposes, pixel (un)shuffle uses torch's channel
ordering, and every block keeps the reference's sublayer structure.

Works with either torch tensors or numpy arrays as dict values.
"""

import numpy as np
import jax.numpy as jnp


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _conv(sd, prefix):
    """torch Conv2d (O,I,kh,kw) -> {w: (kh,kw,I,O), b: (O,)}.
    Depthwise (O,1,kh,kw) maps with the same transpose."""
    w = _np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)
    b = _np(sd[prefix + ".bias"])
    return {"w": jnp.asarray(w), "b": jnp.asarray(b)}


def _dcb(sd, prefix, has_adaptor):
    """DepthConvBlock (reference layers.py:65-132)."""
    p = {}
    if has_adaptor:
        p["adaptor"] = _conv(sd, prefix + ".adaptor")
    p["dc1"] = _conv(sd, prefix + ".dc.0")
    p["dc_dw"] = _conv(sd, prefix + ".dc.2")
    p["dc2"] = _conv(sd, prefix + ".dc.3")
    p["ffn1"] = _conv(sd, prefix + ".ffn.0")
    p["ffn2"] = _conv(sd, prefix + ".ffn.2")
    return p


def _dcb_auto(sd, prefix):
    return _dcb(sd, prefix, prefix + ".adaptor.weight" in sd)


def _subpel(sd, prefix):
    """SubpelConv2x: conv at .conv.0."""
    return {"conv": _conv(sd, prefix + ".conv.0")}


def _rbs2(sd, prefix):
    """ResidualBlockWithStride2: .down conv + .conv DCB(shortcut)."""
    return {"down": _conv(sd, prefix + ".down"),
            "conv": _dcb_auto(sd, prefix + ".conv")}


def _rbu(sd, prefix):
    """ResidualBlockUpsample: .up SubpelConv2x + .conv DCB(shortcut)."""
    return {"up": _subpel(sd, prefix + ".up"),
            "conv": _dcb_auto(sd, prefix + ".conv")}


def _qbank(sd, name):
    return jnp.asarray(_np(sd[name])[:, :, 0, 0])


def _bitparm(sd, prefix, final=False):
    p = {"h": jnp.asarray(_np(sd[prefix + ".h"])[:, :, 0, 0]),
         "b": jnp.asarray(_np(sd[prefix + ".b"])[:, :, 0, 0])}
    if not final:
        p["a"] = jnp.asarray(_np(sd[prefix + ".a"])[:, :, 0, 0])
    return p


def _bit_estimator(sd, prefix):
    return {"f1": _bitparm(sd, prefix + ".f1"),
            "f2": _bitparm(sd, prefix + ".f2"),
            "f3": _bitparm(sd, prefix + ".f3"),
            "f4": _bitparm(sd, prefix + ".f4", final=True)}


def port_dmci(sd):
    """Reference DMCI state dict -> opendcvc_tpu DMCI params."""
    p = {}
    p["enc1"] = _dcb_auto(sd, "enc.enc_1")
    p["enc2"] = [_dcb_auto(sd, f"enc.enc_2.{i}") for i in range(6)]
    p["enc_down"] = _conv(sd, "enc.enc_2.6")
    p["hyper_enc"] = [
        _dcb_auto(sd, "hyper_enc.0"),
        _rbs2(sd, "hyper_enc.1"),
        _rbs2(sd, "hyper_enc.2"),
    ]
    p["hyper_dec"] = [
        _rbu(sd, "hyper_dec.0"),
        _rbu(sd, "hyper_dec.1"),
        _dcb_auto(sd, "hyper_dec.2"),
    ]
    p["y_prior_fusion"] = [
        _dcb_auto(sd, "y_prior_fusion.0"),
        _dcb_auto(sd, "y_prior_fusion.1"),
        _dcb_auto(sd, "y_prior_fusion.2"),
        _conv(sd, "y_prior_fusion.3"),
    ]
    p["reduction"] = _conv(sd, "y_spatial_prior_reduction")
    for k in (1, 2, 3):
        p[f"adaptor_{k}"] = _dcb_auto(sd, f"y_spatial_prior_adaptor_{k}")
    p["y_spatial_prior"] = [
        _dcb_auto(sd, "y_spatial_prior.0"),
        _dcb_auto(sd, "y_spatial_prior.1"),
        _dcb_auto(sd, "y_spatial_prior.2"),
        _conv(sd, "y_spatial_prior.3"),
    ]
    p["dec1_up"] = _rbu(sd, "dec.dec_1.0")
    p["dec1"] = [_dcb_auto(sd, f"dec.dec_1.{i}") for i in range(1, 13)]
    p["dec2"] = _dcb_auto(sd, "dec.dec_2")
    p["q_scale_enc"] = _qbank(sd, "q_scale_enc")
    p["q_scale_dec"] = _qbank(sd, "q_scale_dec")
    p["bit_estimator_z"] = _bit_estimator(sd, "bit_estimator_z")
    return p


def port_dmc(sd):
    """Reference DMC (video) state dict -> opendcvc_tpu DMC params."""
    p = {}
    p["feature_adaptor_i"] = _dcb_auto(sd, "feature_adaptor_i")
    p["feature_adaptor_p"] = _conv(sd, "feature_adaptor_p")
    p["fe_conv1"] = [_dcb_auto(sd, f"feature_extractor.conv1.{i}")
                     for i in range(2)]
    p["fe_conv2"] = [_dcb_auto(sd, f"feature_extractor.conv2.{i}")
                     for i in range(4)]
    p["enc_conv1"] = _conv(sd, "encoder.conv1")
    p["enc_conv2"] = [_dcb_auto(sd, f"encoder.conv2.{i}")
                      for i in range(2)]
    p["enc_conv3"] = _dcb_auto(sd, "encoder.conv3")
    p["enc_down"] = _conv(sd, "encoder.down")
    p["hyper_enc"] = [
        _dcb_auto(sd, "hyper_encoder.conv.0"),
        _rbs2(sd, "hyper_encoder.conv.1"),
        _rbs2(sd, "hyper_encoder.conv.2"),
    ]
    p["hyper_dec"] = [
        _rbu(sd, "hyper_decoder.conv.0"),
        _rbu(sd, "hyper_decoder.conv.1"),
        _dcb_auto(sd, "hyper_decoder.conv.2"),
    ]
    p["temporal_prior"] = _rbs2(sd, "temporal_prior_encoder")
    p["y_prior_fusion"] = [
        _dcb_auto(sd, "y_prior_fusion.conv.0"),
        _dcb_auto(sd, "y_prior_fusion.conv.1"),
        _dcb_auto(sd, "y_prior_fusion.conv.2"),
        _conv(sd, "y_prior_fusion.conv.3"),
    ]
    p["y_spatial_prior"] = [
        _dcb_auto(sd, "y_spatial_prior.conv.0"),
        _dcb_auto(sd, "y_spatial_prior.conv.1"),
        _conv(sd, "y_spatial_prior.conv.2"),
    ]
    p["dec_up"] = _subpel(sd, "decoder.up")
    p["dec_conv1"] = [_dcb_auto(sd, f"decoder.conv1.{i}")
                      for i in range(3)]
    p["dec_conv2"] = _conv(sd, "decoder.conv2")
    p["recon_conv"] = [_dcb_auto(sd, f"recon_generation_net.conv.{i}")
                       for i in range(4)]
    p["recon_head"] = _conv(sd, "recon_generation_net.head")
    for name in ("q_encoder", "q_decoder", "q_feature", "q_recon"):
        p[name] = _qbank(sd, name)
    p["bit_estimator_z"] = _bit_estimator(sd, "bit_estimator_z")
    return p
