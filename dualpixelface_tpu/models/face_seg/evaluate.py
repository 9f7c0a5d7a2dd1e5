"""FaceMaskEstimator — demo-mask inference wrapper.

Parity target: ref `src/module/face_seg/evaluate.py:70-80` — runs the BiSeNet
face parser on a 512x512-resized, ImageNet-normalized crop and returns a
binary face mask (classes 1..13 of the 19 CelebAMask-HQ classes are "face").

Weights: the reference loads `79999_iter.pth`; use
`tools/convert_face_seg_weights.py` to convert that torch checkpoint into an
Orbax tree this wrapper restores. Without weights it runs scratch-initialized
(useful only for shape/wiring tests).
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from dualpixelface_tpu.data.preprocess.augmentation import IMAGENET_MEAN, IMAGENET_STD
from dualpixelface_tpu.models.face_seg.model import BiSeNet
from dualpixelface_tpu.ops.resize import resize_linear

FACE_CLASS_RANGE = (1, 13)  # inclusive: skin..lips per CelebAMask-HQ labels


class FaceMaskEstimator:
    def __init__(self, checkpoint: str | None = None, n_classes: int = 19, size: int = 512):
        self.model = BiSeNet(n_classes=n_classes)
        self.size = size
        dummy = jnp.zeros((1, size, size, 3), jnp.float32)
        self.variables = self.model.init(jax.random.PRNGKey(0), dummy, train=False)
        if checkpoint is not None and Path(checkpoint).exists():
            import orbax.checkpoint as ocp

            with ocp.PyTreeCheckpointer() as ckptr:
                restored = ckptr.restore(
                    Path(checkpoint).absolute(),
                    item=jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, self.variables),
                )
            self.variables = restored

        @jax.jit
        def _fwd(variables, x):
            out, _, _ = self.model.apply(variables, x, train=False)
            return jnp.argmax(out, axis=-1)

        self._fwd = _fwd

    def __call__(self, image: np.ndarray) -> np.ndarray:
        """image: [H, W, 3] uint8 or [0,1] float -> boolean mask [H, W]."""
        h, w = image.shape[:2]
        x = np.asarray(image, np.float32)
        if x.max() > 1.5:
            x = x / 255.0
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        x = np.asarray(
            resize_linear(jnp.asarray(x)[None], (self.size, self.size), (1, 2), True)
        )
        labels = np.asarray(self._fwd(self.variables, jnp.asarray(x)))[0]
        labels = np.asarray(
            resize_linear(
                jnp.asarray(labels, jnp.float32)[None, :, :, None], (h, w), (1, 2), True
            )
        )[0, :, :, 0].round()
        lo, hi = FACE_CLASS_RANGE
        return (labels >= lo) & (labels <= hi)
