"""DCVC — the original conditional-coding codec (NeurIPS'21), TPU-native.

Re-design of the reference DCVC_net (reference:
DCVC-family/DCVC/src/models/DCVC_net.py): SpyNet optical flow, GDN
motion/contextual towers, feature-domain motion compensation with a
context-refine net, factorized priors for z/mv_z, and the 5x5
masked-conv AUTOREGRESSIVE entropy model with per-pixel coding.

The AR decode is inherently serial (each pixel's distribution depends on
already-decoded neighbors, DCVC_net.py:401-472).  There is no good TPU
answer for it: the device runs every dense stage (flow, towers, priors)
and the AR loop runs on the host in float64 numpy — identical code on
the encode and decode sides, so the loop is bit-exact by construction.
The training forward uses the masked conv as one dense pass (the
standard PixelCNN trick), fully jitted.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..layers.blocks import conv_init, conv_apply, conv_transpose2x_apply
from ..layers.gdn import gdn_init, gdn_apply
from ..layers.blocks_hem import hem_spynet_init as spynet_init, \
    hem_spynet_apply as spynet_apply
from ..layers.blocks_evc import lrelu
from ..ops import fused as F
from ..ops.warp import flow_warp
from ..entropy.coder import EntropyCoder
from ..entropy.models import BitEstimator, GaussianEncoder, \
    bit_estimator_init
from . import common as C

CH_MV = 128
CH_N = 64
CH_M = 96


def masked_conv_init(key, in_ch, out_ch, k=5):
    """Type-A causal mask: zero at/after the center in raster order."""
    p = conv_init(key, in_ch, out_ch, k)
    mask = np.ones((k, k, 1, 1), np.float32)
    mask[k // 2, k // 2:, :, :] = 0
    mask[k // 2 + 1:, :, :, :] = 0
    p["mask"] = jnp.asarray(mask)
    return p


def masked_conv_apply(p, x):
    wp = {"w": p["w"] * p["mask"].astype(p["w"].dtype), "b": p["b"]}
    return conv_apply(wp, x, padding=p["w"].shape[0] // 2)


def dcvc_init(key):
    ks = iter(jax.random.split(key, 128))
    p = {}
    p["optic_flow"] = spynet_init(next(ks))
    p["feature_extract"] = {
        "c": conv_init(next(ks), 3, CH_N, 3),
        "res": _res_init(next(ks), CH_N, CH_N),
    }
    p["context_refine"] = {
        "res": _res_init(next(ks), CH_N, CH_N),
        "c": conv_init(next(ks), CH_N, CH_N, 3),
    }
    p["mv_enc"] = {
        "convs": [conv_init(next(ks), 2 if i == 0 else CH_MV, CH_MV, 3)
                  for i in range(4)],
        "gdns": [gdn_init(next(ks), CH_MV) for _ in range(3)],
    }
    p["mv_dec1"] = {
        "convs": [conv_init(next(ks), CH_MV, CH_MV, 3) for _ in range(3)]
        + [conv_init(next(ks), CH_MV, 2, 3)],
        "gdns": [gdn_init(next(ks), CH_MV) for _ in range(3)],
    }
    p["mv_dec2"] = [conv_init(next(ks), 5 if i == 0 else 64,
                              2 if i == 6 else 64, 3) for i in range(7)]
    p["ctx_enc"] = {
        "convs": [conv_init(next(ks), CH_N + 3, CH_N, 5),
                  conv_init(next(ks), CH_N, CH_N, 5),
                  conv_init(next(ks), CH_N, CH_N, 5),
                  conv_init(next(ks), CH_N, CH_M, 5)],
        "gdns": [gdn_init(next(ks), CH_N) for _ in range(3)],
        "res": [_res01_init(next(ks), CH_N), _res01_init(next(ks), CH_N)],
    }
    p["ctx_dec1"] = {
        "subpels": [conv_init(next(ks), CH_M, CH_N * 4, 3)]
        + [conv_init(next(ks), CH_N, CH_N * 4, 3) for _ in range(3)],
        "gdns": [gdn_init(next(ks), CH_N) for _ in range(3)],
        "res": [_res01_init(next(ks), CH_N), _res01_init(next(ks), CH_N)],
    }
    p["ctx_dec2"] = {
        "c1": conv_init(next(ks), CH_N * 2, CH_N, 3),
        "res1": _res_init(next(ks), CH_N, CH_N),
        "res2": _res_init(next(ks), CH_N, CH_N),
        "c2": conv_init(next(ks), CH_N, 3, 3),
    }
    p["prior_enc"] = [conv_init(next(ks), CH_M, CH_N, 3),
                      conv_init(next(ks), CH_N, CH_N, 5),
                      conv_init(next(ks), CH_N, CH_N, 5)]
    p["prior_dec"] = [conv_init(next(ks), CH_N, CH_M, 5),
                      conv_init(next(ks), CH_M, CH_M, 5),
                      conv_init(next(ks), CH_M, CH_M, 3)]
    p["mv_prior_enc"] = [conv_init(next(ks), CH_MV, CH_N, 3),
                         conv_init(next(ks), CH_N, CH_N, 5),
                         conv_init(next(ks), CH_N, CH_N, 5)]
    p["mv_prior_dec"] = [conv_init(next(ks), CH_N, CH_N, 5),
                         conv_init(next(ks), CH_N, CH_N * 3 // 2, 5),
                         conv_init(next(ks), CH_N * 3 // 2, CH_MV * 2, 3)]
    p["entropy_parameters"] = [
        conv_init(next(ks), CH_M * 4, CH_M * 10 // 3, 1),
        conv_init(next(ks), CH_M * 10 // 3, CH_M * 8 // 3, 1),
        conv_init(next(ks), CH_M * 8 // 3, CH_M * 2, 1)]
    p["entropy_parameters_mv"] = [
        conv_init(next(ks), CH_MV * 4, CH_MV * 10 // 3, 1),
        conv_init(next(ks), CH_MV * 10 // 3, CH_MV * 8 // 3, 1),
        conv_init(next(ks), CH_MV * 8 // 3, CH_MV * 2, 1)]
    p["auto_regressive"] = masked_conv_init(next(ks), CH_M, CH_M * 2)
    p["auto_regressive_mv"] = masked_conv_init(next(ks), CH_MV, CH_MV * 2)
    p["temporal_prior_enc"] = {
        "convs": [conv_init(next(ks), CH_N, CH_N, 5),
                  conv_init(next(ks), CH_N, CH_N, 5),
                  conv_init(next(ks), CH_N, CH_N, 5),
                  conv_init(next(ks), CH_N, CH_M, 5)],
        "gdns": [gdn_init(next(ks), CH_N) for _ in range(3)],
    }
    p["bit_estimator_z"] = bit_estimator_init(next(ks), 1, CH_N)
    p["bit_estimator_z_mv"] = bit_estimator_init(next(ks), 1, CH_N)
    return p


def _res_init(key, in_ch, out_ch):
    ks = jax.random.split(key, 3)
    p = {"c1": conv_init(ks[0], in_ch, out_ch, 3),
         "c2": conv_init(ks[1], out_ch, out_ch, 3)}
    if in_ch != out_ch:
        p["adapt"] = conv_init(ks[2], in_ch, out_ch, 1)
    return p


def _res_apply(p, x):
    """Pre-activation ReLU ResBlock (DCVC video_net.py:159-187)."""
    h = jax.nn.relu(x)
    h = conv_apply(p["c1"], h, padding=1)
    h = jax.nn.relu(h)
    h = conv_apply(p["c2"], h, padding=1)
    identity = conv_apply(p["adapt"], x) if "adapt" in p else x
    return identity + h


def _res01_init(key, ch):
    k1, k2 = jax.random.split(key)
    return {"c1": conv_init(k1, ch, ch, 3), "c2": conv_init(k2, ch, ch, 3)}


def _res01_apply(p, x):
    h = lrelu(conv_apply(p["c1"], x, padding=1), 0.1)
    h = lrelu(conv_apply(p["c2"], h, padding=1), 0.1)
    return x + h


# ---------------------------------------------------------------------------
# sub-networks
# ---------------------------------------------------------------------------

def mv_encoder(p, mv):
    e = p["mv_enc"]
    h = mv
    for i in range(4):
        h = conv_apply(e["convs"][i], h, stride=2, padding=1)
        if i < 3:
            h = gdn_apply(e["gdns"][i], h)
    return h


def mv_decoder_part1(p, mv_y_hat):
    d = p["mv_dec1"]
    h = mv_y_hat
    for i in range(3):
        h = conv_transpose2x_apply(d["convs"][i], h)
        h = gdn_apply(d["gdns"][i], h, inverse=True)
    return conv_transpose2x_apply(d["convs"][3], h)


def mv_refine(p, ref, mv):
    h = jnp.concatenate((mv, ref), axis=-1)
    for i, cp in enumerate(p["mv_dec2"]):
        h = conv_apply(cp, h, padding=1)
        if i != 6:
            h = lrelu(h, 0.1)
    return h + mv


def motion_compensation(p, ref, mv):
    feat = conv_apply(p["feature_extract"]["c"], ref, padding=1)
    feat = _res_apply(p["feature_extract"]["res"], feat)
    pred = flow_warp(feat, mv)
    ctx = _res_apply(p["context_refine"]["res"], pred)
    return conv_apply(p["context_refine"]["c"], ctx, padding=1)


def contextual_encoder(p, x, ctx):
    e = p["ctx_enc"]
    h = jnp.concatenate((x, ctx), axis=-1)
    h = gdn_apply(e["gdns"][0], conv_apply(e["convs"][0], h, stride=2,
                                           padding=2))
    h = _res01_apply(e["res"][0], h)
    h = gdn_apply(e["gdns"][1], conv_apply(e["convs"][1], h, stride=2,
                                           padding=2))
    h = _res01_apply(e["res"][1], h)
    h = gdn_apply(e["gdns"][2], conv_apply(e["convs"][2], h, stride=2,
                                           padding=2))
    return conv_apply(e["convs"][3], h, stride=2, padding=2)


def contextual_decoder(p, y_hat, ctx):
    from ..ops.fused import depth_to_space
    d = p["ctx_dec1"]
    h = depth_to_space(conv_apply(d["subpels"][0], y_hat, padding=1), 2)
    h = gdn_apply(d["gdns"][0], h, inverse=True)
    h = depth_to_space(conv_apply(d["subpels"][1], h, padding=1), 2)
    h = gdn_apply(d["gdns"][1], h, inverse=True)
    h = _res01_apply(d["res"][0], h)
    h = depth_to_space(conv_apply(d["subpels"][2], h, padding=1), 2)
    h = gdn_apply(d["gdns"][2], h, inverse=True)
    h = _res01_apply(d["res"][1], h)
    h = depth_to_space(conv_apply(d["subpels"][3], h, padding=1), 2)

    d2 = p["ctx_dec2"]
    out = conv_apply(d2["c1"], jnp.concatenate((h, ctx), axis=-1),
                     padding=1)
    out = _res_apply(d2["res1"], out)
    out = _res_apply(d2["res2"], out)
    return conv_apply(d2["c2"], out, padding=1)


def prior_enc(plist, y):
    h = lrelu(conv_apply(plist[0], y, padding=1), 0.01)
    h = lrelu(conv_apply(plist[1], h, stride=2, padding=2), 0.01)
    return conv_apply(plist[2], h, stride=2, padding=2)


def prior_dec(plist, z, last_pad=1):
    h = lrelu(conv_transpose2x_apply(plist[0], z, torch_padding=2), 0.01)
    h = lrelu(conv_transpose2x_apply(plist[1], h, torch_padding=2), 0.01)
    return conv_apply(plist[2], h, padding=last_pad)


def temporal_prior_enc(p, ctx):
    t = p["temporal_prior_enc"]
    h = ctx
    for i in range(4):
        h = conv_apply(t["convs"][i], h, stride=2, padding=2)
        if i < 3:
            h = gdn_apply(t["gdns"][i], h)
    return h


def entropy_params_apply(plist, x):
    h = lrelu(conv_apply(plist[0], x), 0.01)
    h = lrelu(conv_apply(plist[1], h), 0.01)
    return conv_apply(plist[2], h)


# ---------------------------------------------------------------------------
# jit stage functions (dense device work)
# ---------------------------------------------------------------------------

def _stage_mv_front(p, x, ref):
    est_mv = spynet_apply(p["optic_flow"], x, ref)
    mv_y = mv_encoder(p, est_mv)
    mv_z = prior_enc(p["mv_prior_enc"], mv_y)
    mv_z_hat, mv_z_int8 = F.round_and_to_int8(mv_z)
    return mv_y, mv_z_hat.astype(x.dtype), mv_z_int8


def _stage_mv_prior_params(p, mv_z_hat):
    return prior_dec(p["mv_prior_dec"], mv_z_hat)


def _stage_after_mv(p, ref, mv_y_hat):
    mv_up = mv_decoder_part1(p, mv_y_hat)
    mv_ref = mv_refine(p, ref, mv_up)
    ctx = motion_compensation(p, ref, mv_ref)
    return ctx


def _stage_ctx_front(p, x, ctx):
    y = contextual_encoder(p, x, ctx)
    z = prior_enc(p["prior_enc"], y)
    z_hat, z_int8 = F.round_and_to_int8(z)
    return y, z_hat.astype(x.dtype), z_int8


def _stage_temporal(p, ctx):
    """Shared enc/dec: temporal prior (feeds the y entropy params, so it
    must be the same compiled fn on both sides)."""
    return temporal_prior_enc(p, ctx)


def _stage_y_prior_params(p, z_hat, temporal):
    hp = prior_dec(p["prior_dec"], z_hat)
    return jnp.concatenate((temporal, hp), axis=-1)


def _stage_recon(p, y_hat, ctx):
    return jnp.clip(contextual_decoder(p, y_hat, ctx), 0.0, 1.0)


# ---------------------------------------------------------------------------
# host-side autoregressive coder (float64 numpy, shared enc/dec code)
# ---------------------------------------------------------------------------

class _ARCoder:
    """Per-pixel masked-conv AR entropy model on the host."""

    def __init__(self, params, ar_key, ep_key):
        def f64(a):
            return np.asarray(a, np.float64)
        ar = params[ar_key]
        self.w = f64(ar["w"]) * f64(ar["mask"])  # (5,5,Cin,Cout)
        self.b = f64(ar["b"])
        self.ep = [(f64(c["w"])[0, 0], f64(c["b"]))
                   for c in params[ep_key]]  # 1x1 convs -> matmuls
        self.cin = self.w.shape[2]

    def _ctx_at(self, y_pad, h, w):
        window = y_pad[h:h + 5, w:w + 5, :]  # (5,5,C)
        return np.einsum("klc,klco->o", window, self.w) + self.b

    def _entropy_params(self, prior_vec, ctx_vec):
        h = np.concatenate((prior_vec, ctx_vec))
        for i, (w, b) in enumerate(self.ep):
            h = h @ w + b
            if i != len(self.ep) - 1:
                h = np.where(h >= 0, h, 0.01 * h)
        c = h.shape[0] // 2
        return h[:c], h[c:]  # means, scales

    def encode(self, y, prior, gaussian_encoder):
        """y, prior: (H, W, C) numpy.  Returns y_hat (H,W,C) float64."""
        hgt, wid, c = y.shape
        y = np.asarray(y, np.float64)
        prior = np.asarray(prior, np.float64)
        y_pad = np.zeros((hgt + 4, wid + 4, c))
        y_pad[2:-2, 2:-2] = y
        y_q = np.zeros((hgt, wid, c))
        y_scales = np.zeros((hgt, wid, c))
        for h in range(hgt):
            for w in range(wid):
                ctx = self._ctx_at(y_pad, h, w)
                means, scales = self._entropy_params(prior[h, w], ctx)
                q = np.round(y[h, w] - means)
                y_pad[h + 2, w + 2] = q + means
                y_q[h, w] = q
                y_scales[h, w] = scales
        # one batched symbol write for the whole plane
        smin = gaussian_encoder.SCALE_MIN
        smax = gaussian_encoder.SCALE_MAX
        sc = np.clip(y_scales, smin, smax)
        idx = ((np.log(sc) - gaussian_encoder.log_scale_min)
               * gaussian_encoder.log_step_recip).astype(np.uint8)
        q = np.clip(y_q, -128, 127).astype(np.int16)
        packed = (q << 8) | idx.astype(np.int16)
        gaussian_encoder.encode_y_packed(packed.reshape(-1))
        return y_pad[2:-2, 2:-2]

    def decode(self, prior, gaussian_encoder):
        """prior: (H, W, Cp).  Returns y_hat (H,W,C) float64, decoding one
        pixel vector per step."""
        hgt, wid = prior.shape[0], prior.shape[1]
        prior = np.asarray(prior, np.float64)
        c = self.cin
        y_pad = np.zeros((hgt + 4, wid + 4, c))
        smin = gaussian_encoder.SCALE_MIN
        smax = gaussian_encoder.SCALE_MAX
        for h in range(hgt):
            for w in range(wid):
                ctx = self._ctx_at(y_pad, h, w)
                means, scales = self._entropy_params(prior[h, w], ctx)
                sc = np.clip(scales, smin, smax)
                idx = ((np.log(sc) - gaussian_encoder.log_scale_min)
                       * gaussian_encoder.log_step_recip).astype(np.uint8)
                gaussian_encoder.decode_y(idx)
                q = gaussian_encoder.get_y((c,)).astype(np.float64)
                y_pad[h + 2, w + 2] = q + means
        return y_pad[2:-2, 2:-2]


class DCVCNet:
    """Original DCVC codec.  compress/decompress exchange 4 separate
    strings (mv_z, mv_y, z, y) like the reference CompressAI-era API."""

    def __init__(self, dtype=jnp.float32):
        self.dtype = dtype
        self.params = None
        self.entropy_coder = None
        self.bit_estimator_z = BitEstimator(1, CH_N, support=50)
        self.bit_estimator_z_mv = BitEstimator(1, CH_N, support=50)
        self.gaussian_encoder = GaussianEncoder(
            distribution="laplace", scale_min=0.01, scale_max=64.0,
            scale_levels=256, support=50)
        self._ar = None
        self._ar_mv = None

        self._j_mv_front = jax.jit(_stage_mv_front)
        self._j_mv_prior = jax.jit(_stage_mv_prior_params)
        self._j_after_mv = jax.jit(_stage_after_mv)
        self._j_ctx_front = jax.jit(_stage_ctx_front)
        self._j_temporal = jax.jit(_stage_temporal)
        self._j_y_prior = jax.jit(_stage_y_prior_params)
        self._j_recon = jax.jit(_stage_recon)

    def init_params(self, seed=0):
        self.params = dcvc_init(jax.random.PRNGKey(seed))
        return self.params

    def load_params(self, params):
        self.params = params

    def update(self, force=False):
        self.entropy_coder = EntropyCoder()
        self.gaussian_encoder.update(self.entropy_coder)
        self.bit_estimator_z.update(self.params["bit_estimator_z"],
                                    self.entropy_coder)
        self.bit_estimator_z_mv.update(self.params["bit_estimator_z_mv"],
                                       self.entropy_coder)
        self._ar = _ARCoder(self.params, "auto_regressive",
                            "entropy_parameters")
        self._ar_mv = _ARCoder(self.params, "auto_regressive_mv",
                               "entropy_parameters_mv")

    def _flush_segment(self):
        self.entropy_coder.flush()
        seg = self.entropy_coder.get_encoded_stream()
        self.entropy_coder.reset()
        return seg

    def compress(self, ref_frame, x):
        p = self.params
        x = jnp.asarray(x, self.dtype)
        ref = jnp.asarray(ref_frame, self.dtype)

        mv_y, mv_z_hat, mv_z_int8 = self._j_mv_front(p, x, ref)
        self.entropy_coder.reset()
        self.bit_estimator_z_mv.encode_z(
            np.asarray(mv_z_int8).reshape(-1), 0)
        mv_z_string = self._flush_segment()

        params_mv = self._j_mv_prior(p, mv_z_hat)
        mv_y_hat64 = self._ar_mv.encode(np.asarray(mv_y)[0],
                                        np.asarray(params_mv)[0],
                                        self.gaussian_encoder)
        mv_y_string = self._flush_segment()
        mv_y_hat = jnp.asarray(mv_y_hat64, self.dtype)[None]

        ctx = self._j_after_mv(p, ref, mv_y_hat)
        y, z_hat, z_int8 = self._j_ctx_front(p, x, ctx)
        self.bit_estimator_z.encode_z(np.asarray(z_int8).reshape(-1), 0)
        z_string = self._flush_segment()

        temporal = self._j_temporal(p, ctx)
        prior = self._j_y_prior(p, z_hat, temporal)
        y_hat64 = self._ar.encode(np.asarray(y)[0], np.asarray(prior)[0],
                                  self.gaussian_encoder)
        y_string = self._flush_segment()
        y_hat = jnp.asarray(y_hat64, self.dtype)[None]

        recon = self._j_recon(p, y_hat, ctx)
        return {"mv_z_string": mv_z_string, "mv_y_string": mv_y_string,
                "z_string": z_string, "y_string": y_string,
                "recon_image": recon}

    def decompress(self, ref_frame, mv_y_string, mv_z_string, y_string,
                   z_string, height, width):
        p = self.params
        ref = jnp.asarray(ref_frame, self.dtype)
        z_size = C.get_downsampled_shape(height, width, 64)

        self.entropy_coder.set_stream(mv_z_string)
        self.bit_estimator_z_mv.decode_z(z_size, 0)
        mv_z_hat = jnp.asarray(self.bit_estimator_z_mv.get_z(z_size),
                               self.dtype)
        params_mv = self._j_mv_prior(p, mv_z_hat)

        self.entropy_coder.set_stream(mv_y_string)
        mv_y_hat64 = self._ar_mv.decode(np.asarray(params_mv)[0],
                                        self.gaussian_encoder)
        mv_y_hat = jnp.asarray(mv_y_hat64, self.dtype)[None]

        ctx = self._j_after_mv(p, ref, mv_y_hat)

        self.entropy_coder.set_stream(z_string)
        self.bit_estimator_z.decode_z(z_size, 0)
        z_hat = jnp.asarray(self.bit_estimator_z.get_z(z_size), self.dtype)
        temporal = self._j_temporal(p, ctx)
        prior = self._j_y_prior(p, z_hat, temporal)

        self.entropy_coder.set_stream(y_string)
        y_hat64 = self._ar.decode(np.asarray(prior)[0],
                                  self.gaussian_encoder)
        y_hat = jnp.asarray(y_hat64, self.dtype)[None]

        return self._j_recon(p, y_hat, ctx)
