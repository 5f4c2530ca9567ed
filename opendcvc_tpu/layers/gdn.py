"""GDN (generalized divisive normalization) + LowerBound STE.

Re-design of the reference GDN (reference:
DCVC-family/DCVC-TCM/src/models/video_net.py:27-90 and
DCVC-family/DCVC/src/models/video_net.py:12-91): reparametrized
beta/gamma (sqrt storage with pedestal) bounded by a LowerBound whose
gradient passes through when the input is above the bound OR the
gradient pushes it back up (the STE needed for stable RD training).
"""

import jax
import jax.numpy as jnp
from jax import lax

from .blocks import conv_init  # noqa: F401  (same init conventions)


@jax.custom_vjp
def lower_bound(x, bound):
    return jnp.maximum(x, bound)


def _lb_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lb_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lb_fwd, _lb_bwd)

_REPARAM_OFFSET = 2 ** -18
_PEDESTAL = _REPARAM_OFFSET ** 2


def gdn_init(key, ch, gamma_init=0.1):
    beta = jnp.sqrt(jnp.ones(ch) + _PEDESTAL)
    gamma = jnp.sqrt(gamma_init * jnp.eye(ch) + _PEDESTAL)
    return {"beta": beta, "gamma": gamma}


def gdn_apply(p, x, inverse=False, beta_min=1e-6):
    """x: NHWC.  norm = conv1x1(x^2, gamma) + beta; y = x / sqrt(norm)
    (or x * sqrt(norm) for IGDN)."""
    beta_bound = (beta_min + _PEDESTAL) ** 0.5
    gamma_bound = _REPARAM_OFFSET
    beta = lower_bound(p["beta"], beta_bound) ** 2 - _PEDESTAL
    gamma = lower_bound(p["gamma"], gamma_bound) ** 2 - _PEDESTAL
    # gamma is (C_out, C_in) in torch conv terms -> NHWC matmul with .T
    norm = jnp.einsum("bhwc,oc->bhwo", (x * x).astype(jnp.float32),
                      gamma.astype(jnp.float32),
                      precision=lax.Precision.HIGHEST)
    norm = norm + beta.astype(jnp.float32)
    norm = jnp.sqrt(norm).astype(x.dtype)
    return x * norm if inverse else x / norm
