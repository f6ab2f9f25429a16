"""Flax UNet for articular-surface segmentation of polar-radius images.

The reference ships an ONNX "UNet-CRF" consuming a (1,1,512,512) float32
polar-radius image and emitting a logit mask thresholded at 0 (reference
anatomic_neck.py:62-85).  Its weights are absent from the snapshot
(SURVEY.md §2.2), so shoulder_tpu re-creates the component: same interface
(512x512 normalized polar image in, >0 logit mask out), TPU-first
implementation (NHWC, bf16 activations on the MXU, GroupNorm so batch=1
inference is exact).

The shipped checkpoint (models/params/unet/) is trained on
pipeline-extracted images of exact-truth synthetic humeri plus the real
fixtures (tools/make_unet_corpus.py + tools/train_unet.py, retrained
round 5); with no checkpoint on disk the pipeline falls back to the
classical sphere-consensus segmenter (models/segment.py).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


def _pad_theta(x, k: int = 1):
    """Circular pad on the theta (W) axis: the polar image wraps at +-pi."""
    return jnp.concatenate([x[:, :, -k:], x, x[:, :, :k]], axis=2)


class ConvBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            # zero-pad z (rows), CIRCULAR-pad theta (cols): the image is a
            # cylinder, and the articular arc routinely crosses the seam
            # (the groove-anchored roll puts the seam 35 deg from the cap
            # center).  Same weight shapes as plain SAME padding, so
            # checkpoints stay compatible.
            x = _pad_theta(x)
            x = nn.Conv(self.features, (3, 3),
                        padding=((1, 1), (0, 0)), dtype=self.dtype)(x)
            x = nn.GroupNorm(num_groups=min(8, self.features),
                             dtype=jnp.float32)(x)
            x = nn.gelu(x)
        return x


class UNet(nn.Module):
    """Encoder/decoder with skip connections over the (z, theta) image.

    The theta axis is periodic (the image wraps at +-pi); periodic padding
    is approximated by the training distribution rolling images randomly,
    which the groove-anchored roll in the pipeline mirrors.
    """

    features: Sequence[int] = (16, 32, 64, 128)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, 1) float32 in [0, 1]
        x = x.astype(self.dtype)
        skips = []
        for f in self.features[:-1]:
            x = ConvBlock(f, self.dtype)(x)
            skips.append(x)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(self.features[-1], self.dtype)(x)
        for f, skip in zip(reversed(self.features[:-1]), reversed(skips)):
            b, h, w, c = x.shape
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = nn.Conv(f, (2, 2), padding="SAME", dtype=self.dtype)(x)
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            x = ConvBlock(f, self.dtype)(x)
        logits = nn.Conv(1, (1, 1), dtype=jnp.float32)(x)
        return logits  # (B, H, W, 1); mask = logits > 0


_default_params_cache: list = []


def load_default_params():
    """The shipped articular-UNet checkpoint, loaded once per process.

    Returns None when no checkpoint is available (the pipeline then falls
    back to the sphere-consensus segmenter).  The reference re-created its
    ONNX InferenceSession on every points() call (anatomic_neck.py:62-69);
    loading once is the deliberate fix (SURVEY.md §5 checkpoint/resume).
    """
    if not _default_params_cache:
        import jax

        from shoulder_tpu.models import unet_train

        try:
            # the first call may happen at TRACE time (compute_landmarks
            # resolves the checkpoint inside jit): force the orbax restore
            # to run eagerly — with a trace active, its internal device
            # placement would otherwise see tracers and fail
            with jax.ensure_compile_time_eval():
                _default_params_cache.append(unet_train.load_params())
        except Exception as e:  # unreadable/corrupt checkpoint
            import warnings

            warnings.warn(
                "shoulder_tpu: articular UNet checkpoint failed to load "
                f"({type(e).__name__}: {e}); falling back to the sphere "
                "segmenter for this process",
                RuntimeWarning,
            )
            _default_params_cache.append(None)
    return _default_params_cache[0]


def segment_image(params, image, levels: int = 3):
    """(H, W) normalized polar image -> (H, W) float mask via the UNet.

    Pads to a multiple of 2^levels so skip connections align for any
    window size, then crops back.
    """
    model = UNet()
    h, w = image.shape
    m = 1 << levels
    ph, pw = (-h) % m, (-w) % m
    x = jnp.pad(image, ((0, ph), (0, pw)))
    logits = model.apply(params, x[None, :, :, None])
    return (logits[0, :h, :w, 0] > 0).astype(image.dtype)
