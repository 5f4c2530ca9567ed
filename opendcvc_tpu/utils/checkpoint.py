"""Checkpoint save/load for param pytrees (msgpack via flax.serialization).

The reference loads torch state dicts with prefix stripping
(reference: src/utils/common.py:39-46); here params are plain nested
dicts of arrays so serialization is structural and lossless.
"""

import os

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def save_params(path, params, extra=None):
    """Save a params pytree (and optional metadata dict)."""
    payload = {"params": _to_numpy(params)}
    if extra is not None:
        payload["extra"] = _to_numpy(extra)
    data = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path):
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return payload


def load_params(path):
    payload = load_checkpoint(path)
    if "params" in payload:
        return jax.tree_util.tree_map(lambda a: a, payload["params"])
    return payload
