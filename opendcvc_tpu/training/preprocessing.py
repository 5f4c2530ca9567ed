"""Reference-frame precomputation for cascaded training.

Parity with the reference preprocessing step (reference:
DCVC-family/DCVC/preprocessing.py): run a frozen intra codec over the
first frame of every training clip and store the reconstruction
(ref.png) so the P-frame trainer can load fixed references instead of
re-running the I-codec every step.
"""

import os

import numpy as np
from PIL import Image


def precompute_references(dataset_root, list_file, i_codec, qp, out_name,
                          limit=None, pad_to=64, verbose=False):
    """i_codec: any image codec with .compress(x, qp) -> {'x_hat'}.

    Writes <seq_dir>/<out_name>.png next to each im1.png.
    """
    import jax.numpy as jnp
    from ..models import common as CM
    from ..ops.fused import replicate_pad

    seq_root = os.path.join(dataset_root, "sequences")
    with open(list_file) as f:
        seqs = [ln.strip() for ln in f if ln.strip()]
    if limit:
        seqs = seqs[:limit]

    for i, seq in enumerate(seqs):
        src = os.path.join(seq_root, seq, "im1.png")
        dst = os.path.join(seq_root, seq, f"{out_name}.png")
        img = np.asarray(Image.open(src).convert("RGB"),
                         dtype=np.float32) / 255.0
        h, w, _ = img.shape
        pr, pb = CM.get_padding_size(h, w, pad_to)
        x = replicate_pad(jnp.asarray(img[None]), pb, pr)
        out = i_codec.compress(x, qp)
        x_hat = np.asarray(out["x_hat"])[0, :h, :w]
        rec = np.clip(np.round(x_hat * 255), 0, 255).astype(np.uint8)
        Image.fromarray(rec).save(dst)
        if verbose and (i + 1) % 100 == 0:
            print(f"precomputed {i + 1}/{len(seqs)}")
    return len(seqs)
