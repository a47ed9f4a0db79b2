"""Checkpointing: persist per-fold winner models + sweep state.

The reference saves full Keras models per trial via ModelCheckpoint and
then DELETES them all at the end of the run (training.py:98-115,
tune_ECMWF_com.py:183-186) — only RPSS netcdfs survive. Here winners are
kept as msgpack param pytrees + a JSON manifest (config, hparams, input
shape), enabling the 'load' training_type (training.py:127-131), realtime
prediction and GradCAM without retraining. Orbax is used when available
for directory checkpoints; the msgpack path has no extra dependencies.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Tuple

import jax
import numpy as np
from flax import serialization

from ..models import UNet, UNetConfig


def save_variables(variables, path):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(variables))
    return path


def load_variables(path, template):
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_sweep_winners(sweep_result, out_dir, week, architecture="unet",
                       input_shape=None, fingerprint=None):
    """Persist each fold's winning model (mirrors the reference's
    best_model_{arch}_{i}_tuned.keras naming, training.py:115).

    fingerprint: dict of run settings (standardize/predictor/source/seed/…)
    recorded per entry; the 'load' replay validates it so a flag mismatch
    fails loudly instead of silently producing different predictions."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = []
    for i, (variables, trial, cfg) in enumerate(zip(
            sweep_result.winner_variables, sweep_result.best_trial,
            sweep_result.winner_configs)):
        fname = f"best_model_{architecture}_{i}_tuned.msgpack"
        save_variables(variables, os.path.join(out_dir, fname))
        manifest.append({
            "fold": i, "file": fname,
            "architecture": architecture,
            "config": dataclasses.asdict(cfg),
            "hparams": trial.hparams(),
            "val_loss": float(sweep_result.best_val_loss[i]),
            "input_shape": list(input_shape) if input_shape else None,
            "fingerprint": dict(fingerprint) if fingerprint else None,
        })
    mpath = os.path.join(out_dir, f"winners_{week}.json")
    with open(mpath, "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    return mpath


def save_fixed_winners(var_list, val_losses, out_dir, week,
                       architecture, input_shape=None, hparams=None,
                       fingerprint=None, config=None):
    """Persist per-fold winners of a fixed (non-tuned) training run —
    the cnn/mlp architecture branch (training.py:53-64) and the U-Net
    training_type='train' mode (training.py:119-125; config then carries
    the UNetConfig so 'load' can rebuild it)."""
    os.makedirs(out_dir, exist_ok=True)
    cfg_dict = dataclasses.asdict(config) if config is not None else None
    manifest = []
    for i, variables in enumerate(var_list):
        fname = f"best_model_{architecture}_{i}_trained.msgpack"
        save_variables(variables, os.path.join(out_dir, fname))
        manifest.append({
            "fold": i, "file": fname,
            "architecture": architecture,
            "config": cfg_dict,
            "hparams": dict(hparams or {}),
            "val_loss": float(val_losses[i]),
            "input_shape": list(input_shape) if input_shape else None,
            "fingerprint": dict(fingerprint) if fingerprint else None,
        })
    mpath = os.path.join(out_dir, f"winners_{week}.json")
    with open(mpath, "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    return mpath


def _build_model(entry, architecture):
    arch = entry.get("architecture", architecture)
    shape = entry["input_shape"] or [1, 32, 32, 1]
    if arch == "cnn":
        from ..models import CNN
        return CNN(), shape
    if arch == "mlp":
        from ..models import MLP
        return MLP(spatial_shape=tuple(shape[1:3])), shape
    cfg_d = dict(entry["config"])
    cfg_d["ct_kernel"] = tuple(cfg_d["ct_kernel"])
    cfg_d["ct_stride"] = tuple(cfg_d["ct_stride"])
    return UNet(UNetConfig(**cfg_d)), shape


def load_winner(out_dir, week, fold, architecture="unet"):
    """Rebuild a fold's winning model + variables from a manifest —
    the 'load' training path (training.py:127-131). Dispatches on the
    manifest's architecture (unet/cnn/mlp)."""
    with open(os.path.join(out_dir, f"winners_{week}.json")) as f:
        manifest = json.load(f)
    entry = next(e for e in manifest if e["fold"] == fold)
    model, shape = _build_model(entry, architecture)
    template = dict(model.init(jax.random.key(0),
                               np.zeros(shape, np.float32), train=False))
    # saved winners always carry a batch_stats collection (train_fold's
    # output tree, engine.py:200 — empty for BN-less models); init omits it
    template.setdefault("batch_stats", {})
    variables = load_variables(os.path.join(out_dir, entry["file"]), template)
    return model, variables


def save_orbax(variables, path):
    """Orbax directory checkpoint (async-capable, multi-host-ready) —
    optional fast path when orbax is importable."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), variables, force=True)
    ckptr.wait_until_finished()
    return path


def load_orbax(path, template):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
