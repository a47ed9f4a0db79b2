"""GradCAM attribution via jax.grad (rebuilding the capability of the
reference's missing Realtime_fcast_MME.ipynb, README.md:22).

Grad-CAM (Selvaraju et al. 2017): for a target scalar score s (e.g. the
mean predicted above-normal probability over a region), weight each
bottleneck channel by the spatial mean of ds/dA_k and combine:

    cam = relu( sum_k mean_hw(ds/dA_k) * A_k )

The gradient w.r.t. the intermediate activation is taken through a
zero-valued additive tap in the U-Net bottleneck (models/unet.py), which
keeps the whole thing a single jax.grad — no graph surgery, fully
jittable, vmappable over samples.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _bottleneck_shape(model, variables, x):
    _, inter = model.apply(variables, x, train=False,
                           mutable=["intermediates"])
    return inter["intermediates"]["bottleneck"][0].shape


def gradcam(model, variables, x, category=2, region_mask=None,
            upsample=True):
    """Grad-CAM heatmaps for a batch.

    x: (N, H, W, C) inputs; category: tercile index (2 = above normal);
    region_mask: optional (H, W) bool — restrict the score to a region
    (e.g. a homogeneous climate zone); default = whole domain.
    Returns (N, H, W) normalized [0, 1] heatmaps.
    """
    bshape = _bottleneck_shape(model, variables, x)
    zeros = jnp.zeros(bshape, jnp.float32)

    def score_and_acts(delta):
        probs, inter = model.apply(variables, x, train=False,
                                   bottleneck_delta=delta,
                                   mutable=["intermediates"])
        p = probs[..., category]
        if region_mask is not None:
            w = jnp.asarray(region_mask, jnp.float32)
            p = (p * w).sum(axis=(-2, -1)) / jnp.maximum(w.sum(), 1.0)
        else:
            p = p.mean(axis=(-2, -1))
        acts = inter["intermediates"]["bottleneck"][0]
        return p.sum(), acts

    grads, acts = jax.grad(score_and_acts, has_aux=True)(zeros)
    weights = grads.mean(axis=(1, 2), keepdims=True)       # (N,1,1,K)
    cam = jax.nn.relu(jnp.sum(weights * acts, axis=-1))    # (N, h, w)
    cam = cam / jnp.maximum(cam.max(axis=(1, 2), keepdims=True), 1e-12)
    if upsample:
        cam = jax.image.resize(cam, (cam.shape[0],) + x.shape[1:3],
                               method="bilinear")
    return cam


def saliency(model, variables, x, category=2):
    """Plain input-gradient saliency |d p_cat / d x| as a cheap companion
    diagnostic. Returns (N, H, W)."""
    def score(xi):
        p = model.apply(variables, xi, train=False)[..., category]
        return p.mean()
    g = jax.grad(lambda xi: score(xi))(x)
    return jnp.abs(g).sum(axis=-1)
