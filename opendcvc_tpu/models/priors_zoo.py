"""CompressAI-era image-codec zoo (DCVC's I-frame models), TPU-native.

Re-design of the reference priors (reference:
DCVC-family/DCVC/src/models/priors.py and waseda.py): FactorizedPrior,
ScaleHyperprior, MeanScaleHyperprior, JointAutoregressiveHierarchicalPriors,
Cheng2020Anchor, plus the model registry (zoo/image.py:26-32).

Conventions: 5x5 stride-2 conv towers with GDN, transpose convs for
synthesis; y symbols clamped to int8 range (negligible at convergence —
trained latents stay well inside); CompressAI scale table
exp(linspace(log(0.11), log(256), 64)).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..layers.blocks import conv_init, conv_apply, conv_transpose2x_apply
from ..layers.gdn import gdn_init, gdn_apply
from ..layers import blocks_evc as E
from ..layers import blocks_hem as H
from ..ops import fused as F
from ..entropy.coder import EntropyCoder
from ..entropy.models import BitEstimator, GaussianEncoder, \
    bit_estimator_init
from . import common as C
from .dcvc import masked_conv_init, _ARCoder


def _ga_init(key, N, M):
    ks = jax.random.split(key, 7)
    return {"convs": [conv_init(ks[0], 3, N, 5),
                      conv_init(ks[1], N, N, 5),
                      conv_init(ks[2], N, N, 5),
                      conv_init(ks[3], N, M, 5)],
            "gdns": [gdn_init(k, N) for k in ks[4:7]]}


def _ga_apply(p, x):
    h = x
    for i in range(4):
        h = conv_apply(p["convs"][i], h, stride=2, padding=2)
        if i < 3:
            h = gdn_apply(p["gdns"][i], h)
    return h


def _gs_init(key, N, M):
    ks = jax.random.split(key, 7)
    return {"convs": [conv_init(ks[0], M, N, 5),
                      conv_init(ks[1], N, N, 5),
                      conv_init(ks[2], N, N, 5),
                      conv_init(ks[3], N, 3, 5)],
            "gdns": [gdn_init(k, N) for k in ks[4:7]]}


def _gs_apply(p, y):
    h = y
    for i in range(4):
        h = conv_transpose2x_apply(p["convs"][i], h, torch_padding=2)
        if i < 3:
            h = gdn_apply(p["gdns"][i], h, inverse=True)
    return h


class _ZooBase:
    """Common orchestration: factorized z/y coding + gaussian y coding."""

    def __init__(self, N, M, dtype=jnp.float32):
        self.N, self.M = N, M
        self.dtype = dtype
        self.params = None
        self.entropy_coder = None
        self.gaussian_encoder = GaussianEncoder(
            distribution="gaussian", scale_min=0.11, scale_max=256.0,
            scale_levels=64, support=50)
        self._cfg = None

    def load_params(self, params):
        self.params = params

    def update(self, force=False):
        self.entropy_coder = EntropyCoder()
        self.gaussian_encoder.update(self.entropy_coder)
        self.bottleneck.update(self.params["bottleneck"],
                               self.entropy_coder)
        self._cfg = (self.gaussian_encoder.SCALE_MIN,
                     self.gaussian_encoder.SCALE_MAX,
                     float(np.log(self.gaussian_encoder.SCALE_MIN)),
                     self.gaussian_encoder.log_step_recip)

    def _segment(self):
        self.entropy_coder.flush()
        seg = self.entropy_coder.get_encoded_stream()
        self.entropy_coder.reset()
        return seg

    def _encode_factorized(self, q_int8):
        self.entropy_coder.reset()
        self.bottleneck.encode_z(np.asarray(q_int8).reshape(-1), 0)
        return self._segment()

    def _decode_factorized(self, shape_hw):
        self.bottleneck.decode_z(shape_hw, 0)
        return self.bottleneck.get_z(shape_hw)

    def _encode_gaussian(self, y_q, scales):
        smin, smax, lsm, recip = self._cfg
        sc = np.clip(np.asarray(scales, np.float32), smin, smax)
        idx = ((np.log(sc) - lsm) * recip).astype(np.uint8)
        q = np.clip(np.asarray(y_q), -128, 127).astype(np.int16)
        packed = (q << 8) | idx.astype(np.int16)
        self.entropy_coder.reset()
        self.gaussian_encoder.encode_y_packed(packed.reshape(-1))
        return self._segment()

    def _decode_gaussian(self, scales):
        smin, smax, lsm, recip = self._cfg
        sc = np.clip(np.asarray(scales, np.float32), smin, smax)
        idx = ((np.log(sc) - lsm) * recip).astype(np.uint8)
        self.gaussian_encoder.decode_y(idx.reshape(-1))
        return self.gaussian_encoder.get_y(sc.shape)


class FactorizedPrior(_ZooBase):
    def __init__(self, N=128, M=192, dtype=jnp.float32):
        super().__init__(N, M, dtype)
        self.bottleneck = BitEstimator(1, M, support=50)
        self._j_ga = jax.jit(lambda p, x: _ga_apply(p["g_a"], x))
        self._j_gs = jax.jit(
            lambda p, y: jnp.clip(_gs_apply(p["g_s"], y), 0.0, 1.0))

    def init_params(self, seed=0):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        self.params = {"g_a": _ga_init(k1, self.N, self.M),
                       "g_s": _gs_init(k2, self.N, self.M),
                       "bottleneck": bit_estimator_init(k3, 1, self.M)}
        return self.params

    def compress(self, x):
        y = self._j_ga(self.params, jnp.asarray(x, self.dtype))
        _, y_int8 = F.round_and_to_int8(y)
        y_string = self._encode_factorized(y_int8)
        return {"strings": [[y_string]],
                "shape": (y.shape[1], y.shape[2])}

    def decompress(self, strings, shape):
        self.entropy_coder.set_stream(strings[0][0])
        y_hat = jnp.asarray(self._decode_factorized(shape), self.dtype)
        return {"x_hat": self._j_gs(self.params, y_hat)}


class ScaleHyperprior(_ZooBase):
    mean_scale = False

    def __init__(self, N=128, M=192, dtype=jnp.float32):
        super().__init__(N, M, dtype)
        self.bottleneck = BitEstimator(1, N, support=50)
        self._j_ga = jax.jit(self._fwd_ga)
        self._j_hs = jax.jit(self._fwd_hs)
        self._j_gs = jax.jit(
            lambda p, y: jnp.clip(_gs_apply(p["g_s"], y), 0.0, 1.0))

    @staticmethod
    def _fwd_ga(p, x):
        y = _ga_apply(p["g_a"], x)
        ha_in = jnp.abs(y)
        h = jax.nn.relu(conv_apply(p["h_a"][0], ha_in, padding=1))
        h = jax.nn.relu(conv_apply(p["h_a"][1], h, stride=2, padding=2))
        z = conv_apply(p["h_a"][2], h, stride=2, padding=2)
        return y, z

    @staticmethod
    def _fwd_hs(p, z_hat):
        h = jax.nn.relu(conv_transpose2x_apply(p["h_s"][0], z_hat,
                                               torch_padding=2))
        h = jax.nn.relu(conv_transpose2x_apply(p["h_s"][1], h,
                                               torch_padding=2))
        return jax.nn.relu(conv_apply(p["h_s"][2], h, padding=1))

    def init_params(self, seed=0):
        ks = jax.random.split(jax.random.PRNGKey(seed), 9)
        N, M = self.N, self.M
        self.params = {
            "g_a": _ga_init(ks[0], N, M),
            "g_s": _gs_init(ks[1], N, M),
            "h_a": [conv_init(ks[2], M, N, 3), conv_init(ks[3], N, N, 5),
                    conv_init(ks[4], N, N, 5)],
            "h_s": [conv_init(ks[5], N, N, 5), conv_init(ks[6], N, N, 5),
                    conv_init(ks[7], N, M, 3)],
            "bottleneck": bit_estimator_init(ks[8], 1, N),
        }
        return self.params

    def compress(self, x):
        y, z = self._j_ga(self.params, jnp.asarray(x, self.dtype))
        _, z_int8 = F.round_and_to_int8(z)
        z_string = self._encode_factorized(z_int8)
        z_hat = jnp.asarray(np.asarray(z_int8, np.float32), self.dtype)
        scales = self._j_hs(self.params, z_hat)
        y_q = np.round(np.asarray(y, np.float32))
        y_string = self._encode_gaussian(y_q, scales)
        return {"strings": [[y_string], [z_string]],
                "shape": (z.shape[1], z.shape[2])}

    def decompress(self, strings, shape):
        self.entropy_coder.set_stream(strings[1][0])
        z_hat = jnp.asarray(self._decode_factorized(shape), self.dtype)
        scales = self._j_hs(self.params, z_hat)
        self.entropy_coder.set_stream(strings[0][0])
        y_hat = jnp.asarray(self._decode_gaussian(scales), self.dtype)
        return {"x_hat": self._j_gs(self.params, y_hat)}


class MeanScaleHyperprior(ScaleHyperprior):
    mean_scale = True

    @staticmethod
    def _fwd_ga(p, x):
        y = _ga_apply(p["g_a"], x)
        h = E.lrelu(conv_apply(p["h_a"][0], y, padding=1), 0.01)
        h = E.lrelu(conv_apply(p["h_a"][1], h, stride=2, padding=2), 0.01)
        z = conv_apply(p["h_a"][2], h, stride=2, padding=2)
        return y, z

    @staticmethod
    def _fwd_hs(p, z_hat):
        h = E.lrelu(conv_transpose2x_apply(p["h_s"][0], z_hat,
                                           torch_padding=2), 0.01)
        h = E.lrelu(conv_transpose2x_apply(p["h_s"][1], h,
                                           torch_padding=2), 0.01)
        return conv_apply(p["h_s"][2], h, padding=1)

    def init_params(self, seed=0):
        ks = jax.random.split(jax.random.PRNGKey(seed), 9)
        N, M = self.N, self.M
        self.params = {
            "g_a": _ga_init(ks[0], N, M),
            "g_s": _gs_init(ks[1], N, M),
            "h_a": [conv_init(ks[2], M, N, 3), conv_init(ks[3], N, N, 5),
                    conv_init(ks[4], N, N, 5)],
            "h_s": [conv_init(ks[5], N, M, 5),
                    conv_init(ks[6], M, M * 3 // 2, 5),
                    conv_init(ks[7], M * 3 // 2, M * 2, 3)],
            "bottleneck": bit_estimator_init(ks[8], 1, N),
        }
        return self.params

    def compress(self, x):
        y, z = self._j_ga(self.params, jnp.asarray(x, self.dtype))
        _, z_int8 = F.round_and_to_int8(z)
        z_string = self._encode_factorized(z_int8)
        z_hat = jnp.asarray(np.asarray(z_int8, np.float32), self.dtype)
        gp = self._j_hs(self.params, z_hat)
        c = gp.shape[-1] // 2
        scales, means = np.asarray(gp[..., :c]), np.asarray(gp[..., c:])
        y_q = np.round(np.asarray(y, np.float32) - means)
        y_string = self._encode_gaussian(y_q, scales)
        return {"strings": [[y_string], [z_string]],
                "shape": (z.shape[1], z.shape[2])}

    def decompress(self, strings, shape):
        self.entropy_coder.set_stream(strings[1][0])
        z_hat = jnp.asarray(self._decode_factorized(shape), self.dtype)
        gp = self._j_hs(self.params, z_hat)
        c = gp.shape[-1] // 2
        scales, means = np.asarray(gp[..., :c]), np.asarray(gp[..., c:])
        self.entropy_coder.set_stream(strings[0][0])
        y_q = self._decode_gaussian(scales)
        y_hat = jnp.asarray(y_q + means.astype(np.float32), self.dtype)
        return {"x_hat": self._j_gs(self.params, y_hat)}


class JointAutoregressiveHierarchicalPriors(_ZooBase):
    """Joint hierarchical + autoregressive priors; AR loop on the host
    (priors.py:421-...)."""

    def __init__(self, N=192, M=192, dtype=jnp.float32):
        super().__init__(N, M, dtype)
        self.bottleneck = BitEstimator(1, N, support=50)
        self._ar = None
        self._j_ga = jax.jit(self._fwd_ga)
        self._j_hs = jax.jit(self._fwd_hs)
        self._j_gs = jax.jit(
            lambda p, y: jnp.clip(self._fwd_gs(p, y), 0.0, 1.0))

    # overridable tower applies
    @staticmethod
    def _ga_tower(p, x):
        return _ga_apply(p["g_a"], x)

    @staticmethod
    def _gs_tower(p, y):
        return _gs_apply(p["g_s"], y)

    @classmethod
    def _fwd_ga(cls, p, x):
        y = cls._ga_tower(p, x)
        h = E.lrelu(conv_apply(p["h_a"][0], y, padding=1), 0.01)
        h = E.lrelu(conv_apply(p["h_a"][1], h, stride=2, padding=2), 0.01)
        z = conv_apply(p["h_a"][2], h, stride=2, padding=2)
        return y, z

    @classmethod
    def _fwd_hs(cls, p, z_hat):
        h = E.lrelu(conv_transpose2x_apply(p["h_s"][0], z_hat,
                                           torch_padding=2), 0.01)
        h = E.lrelu(conv_transpose2x_apply(p["h_s"][1], h,
                                           torch_padding=2), 0.01)
        return conv_apply(p["h_s"][2], h, padding=1)

    @classmethod
    def _fwd_gs(cls, p, y):
        return cls._gs_tower(p, y)

    def init_params(self, seed=0):
        ks = jax.random.split(jax.random.PRNGKey(seed), 12)
        N, M = self.N, self.M
        self.params = {
            "g_a": _ga_init(ks[0], N, M),
            "g_s": _gs_init(ks[1], N, M),
            "h_a": [conv_init(ks[2], M, N, 3), conv_init(ks[3], N, N, 5),
                    conv_init(ks[4], N, N, 5)],
            "h_s": [conv_init(ks[5], N, M, 5),
                    conv_init(ks[6], M, M * 3 // 2, 5),
                    conv_init(ks[7], M * 3 // 2, M * 2, 3)],
            "entropy_parameters": [
                conv_init(ks[8], M * 4, M * 10 // 3, 1),
                conv_init(ks[9], M * 10 // 3, M * 8 // 3, 1),
                conv_init(ks[10], M * 8 // 3, M * 2, 1)],
            "context_prediction": masked_conv_init(ks[11], M, M * 2),
            "bottleneck": bit_estimator_init(
                jax.random.fold_in(jax.random.PRNGKey(seed), 99), 1, N),
        }
        return self.params

    def update(self, force=False):
        super().update(force)
        self._ar = _ARCoder(self.params, "context_prediction",
                            "entropy_parameters")

    def compress(self, x):
        y, z = self._j_ga(self.params, jnp.asarray(x, self.dtype))
        _, z_int8 = F.round_and_to_int8(z)
        z_string = self._encode_factorized(z_int8)
        z_hat = jnp.asarray(np.asarray(z_int8, np.float32), self.dtype)
        prior = self._j_hs(self.params, z_hat)
        self.entropy_coder.reset()
        self._ar.encode(np.asarray(y)[0], np.asarray(prior)[0],
                        self.gaussian_encoder)
        y_string = self._segment()
        return {"strings": [[y_string], [z_string]],
                "shape": (z.shape[1], z.shape[2])}

    def decompress(self, strings, shape):
        self.entropy_coder.set_stream(strings[1][0])
        z_hat = jnp.asarray(self._decode_factorized(shape), self.dtype)
        prior = self._j_hs(self.params, z_hat)
        self.entropy_coder.set_stream(strings[0][0])
        y_hat64 = self._ar.decode(np.asarray(prior)[0],
                                  self.gaussian_encoder)
        y_hat = jnp.asarray(y_hat64, self.dtype)[None]
        return {"x_hat": self._j_gs(self.params, y_hat)}


class Cheng2020Anchor(JointAutoregressiveHierarchicalPriors):
    """Residual-block towers + subpel upsampling (waseda.py:28-95)."""

    def __init__(self, N=192, dtype=jnp.float32):
        super().__init__(N=N, M=N, dtype=dtype)

    @staticmethod
    def _ga_tower(p, x):
        g = p["g_a"]
        h = E.res_block_stride_apply(g["rbs1"], x)
        h = H.residual_block_apply(g["rb1"], h)
        h = E.res_block_stride_apply(g["rbs2"], h)
        h = H.residual_block_apply(g["rb2"], h)
        h = E.res_block_stride_apply(g["rbs3"], h)
        h = H.residual_block_apply(g["rb3"], h)
        return conv_apply(g["down"], h, stride=2, padding=1)

    @staticmethod
    def _gs_tower(p, y):
        from ..ops.fused import depth_to_space
        g = p["g_s"]
        h = H.residual_block_apply(g["rb1"], y)
        h = E.res_block_upsample_apply(g["rbu1"], h)
        h = H.residual_block_apply(g["rb2"], h)
        h = E.res_block_upsample_apply(g["rbu2"], h)
        h = H.residual_block_apply(g["rb3"], h)
        h = E.res_block_upsample_apply(g["rbu3"], h)
        h = H.residual_block_apply(g["rb4"], h)
        return depth_to_space(conv_apply(g["subpel"], h, padding=1), 2)

    @classmethod
    def _fwd_ga(cls, p, x):
        y = cls._ga_tower(p, x)
        h = E.lrelu(conv_apply(p["h_a"][0], y, padding=1), 0.01)
        h = E.lrelu(conv_apply(p["h_a"][1], h, padding=1), 0.01)
        h = E.lrelu(conv_apply(p["h_a"][2], h, stride=2, padding=1), 0.01)
        h = E.lrelu(conv_apply(p["h_a"][3], h, padding=1), 0.01)
        z = conv_apply(p["h_a"][4], h, stride=2, padding=1)
        return y, z

    @classmethod
    def _fwd_hs(cls, p, z_hat):
        from ..ops.fused import depth_to_space
        h = E.lrelu(conv_apply(p["h_s"][0], z_hat, padding=1), 0.01)
        h = E.lrelu(depth_to_space(conv_apply(p["h_s"][1], h, padding=1),
                                   2), 0.01)
        h = E.lrelu(conv_apply(p["h_s"][2], h, padding=1), 0.01)
        h = E.lrelu(depth_to_space(conv_apply(p["h_s"][3], h, padding=1),
                                   2), 0.01)
        return conv_apply(p["h_s"][4], h, padding=1)

    def init_params(self, seed=0):
        ks = jax.random.split(jax.random.PRNGKey(seed), 24)
        N = self.N
        self.params = {
            "g_a": {
                "rbs1": E.res_block_stride_init(ks[0], 3, N),
                "rb1": H.residual_block_init(ks[1], N, N),
                "rbs2": E.res_block_stride_init(ks[2], N, N),
                "rb2": H.residual_block_init(ks[3], N, N),
                "rbs3": E.res_block_stride_init(ks[4], N, N),
                "rb3": H.residual_block_init(ks[5], N, N),
                "down": conv_init(ks[6], N, N, 3),
            },
            "g_s": {
                "rb1": H.residual_block_init(ks[7], N, N),
                "rbu1": E.res_block_upsample_init(ks[8], N, N),
                "rb2": H.residual_block_init(ks[9], N, N),
                "rbu2": E.res_block_upsample_init(ks[10], N, N),
                "rb3": H.residual_block_init(ks[11], N, N),
                "rbu3": E.res_block_upsample_init(ks[12], N, N),
                "rb4": H.residual_block_init(ks[13], N, N),
                "subpel": conv_init(ks[14], N, 3 * 4, 3),
            },
            "h_a": [conv_init(ks[15], N, N, 3), conv_init(ks[16], N, N, 3),
                    conv_init(ks[17], N, N, 3), conv_init(ks[18], N, N, 3),
                    conv_init(ks[19], N, N, 3)],
            "h_s": [conv_init(ks[20], N, N, 3),
                    conv_init(ks[21], N, N * 4, 3),
                    conv_init(ks[22], N, N * 3 // 2, 3),
                    conv_init(ks[23], N * 3 // 2, N * 3 // 2 * 4, 3),
                    conv_init(jax.random.fold_in(jax.random.PRNGKey(seed),
                                                 98),
                              N * 3 // 2, N * 2, 3)],
            "entropy_parameters": [
                conv_init(jax.random.fold_in(jax.random.PRNGKey(seed), 97),
                          N * 4, N * 10 // 3, 1),
                conv_init(jax.random.fold_in(jax.random.PRNGKey(seed), 96),
                          N * 10 // 3, N * 8 // 3, 1),
                conv_init(jax.random.fold_in(jax.random.PRNGKey(seed), 95),
                          N * 8 // 3, N * 2, 1)],
            "context_prediction": masked_conv_init(
                jax.random.fold_in(jax.random.PRNGKey(seed), 94), N, N * 2),
            "bottleneck": bit_estimator_init(
                jax.random.fold_in(jax.random.PRNGKey(seed), 93), 1, N),
        }
        return self.params


# registry (reference: DCVC-family/DCVC/src/zoo/image.py:26-32)
IMAGE_CODEC_ZOO = {
    "bmshj2018-factorized": FactorizedPrior,
    "bmshj2018-hyperprior": ScaleHyperprior,
    "mbt2018-mean": MeanScaleHyperprior,
    "mbt2018": JointAutoregressiveHierarchicalPriors,
    "cheng2020-anchor": Cheng2020Anchor,
}
