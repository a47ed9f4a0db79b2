"""Pipeline-level coverage for the two reference capabilities that are
unit-tested but were never driven through run_pipeline: the
multi_predictor mode (preprocessing.py:25-27 — each ensemble member is an
input channel) and the U-Net deterministic head (deep_nn_models.py:102-105
— a ReLU precip head; dead code in the reference's trainer, trainable
here via NaN-masked MSE and scored by fold-edge categorization)."""

import dataclasses
import json
import os

import numpy as np
import pytest

from s2s_ismr_tpu.pipelines import get_config
from s2s_ismr_tpu.pipelines.tune import run_pipeline


def _fast_cfg(**kw):
    return dataclasses.replace(get_config("tune_ECMWF_com").fast_variant(),
                               years=(2003, 2012), epochs=3, **kw)


@pytest.mark.slow
def test_pipeline_multi_predictor(tmp_path):
    cfg = _fast_cfg(predictor="multi_predictor")
    out = run_pipeline(cfg, source="synthetic", out_root=str(tmp_path),
                       synthetic_step=2.0, log=lambda *a: None)
    # winner checkpoints record the member-channel input shape
    mpath = os.path.join(str(tmp_path), "models", cfg.out_dir,
                         "ECMWF_IMD", cfg.week, f"winners_{cfg.week}.json")
    with open(mpath) as fh:
        manifest = json.load(fh)
    c_in = manifest[0]["input_shape"][-1]
    assert c_in > 1                       # members, not the ensemble mean
    land = np.isfinite(out.nn.labels[0]).any(axis=0)
    rp = out.nn.rpss_test.values
    assert np.isfinite(rp[:, land]).all()
    assert out.nn.predictions.shape[-1] == 3


@pytest.mark.slow
def test_pipeline_deterministic_head(tmp_path):
    cfg = _fast_cfg(output="deterministic")
    out = run_pipeline(cfg, source="synthetic", out_root=str(tmp_path),
                       synthetic_step=2.0, log=lambda *a: None)
    preds = out.nn.predictions            # categorized one-hot (F,T,Y,X,3)
    assert preds.shape[-1] == 3
    finite = np.isfinite(preds).all(axis=-1)
    vals = preds[finite]
    assert set(np.unique(vals)) <= {0.0, 1.0}
    np.testing.assert_allclose(vals.sum(-1), 1.0)
    land = np.isfinite(out.nn.labels[0]).any(axis=0)
    assert np.isfinite(out.nn.rpss_test.values[:, land]).all()

    # the persisted winner really is the 1-channel ReLU head
    from s2s_ismr_tpu.pipelines.realtime import load_winner_for_realtime
    import jax.numpy as jnp
    mdir = os.path.join(str(tmp_path), "models", cfg.out_dir,
                        "ECMWF_IMD", cfg.week)
    model, variables = load_winner_for_realtime(mdir, cfg.week)
    y = model.apply(variables, jnp.zeros((1, 16, 16, 1)), train=False)
    assert y.shape == (1, 16, 16, 1)
    assert (np.asarray(y) >= 0).all()     # ReLU head

    # load-mode replay converts through the same categorization and is
    # bit-identical to the tune run
    loaded = run_pipeline(cfg, source="synthetic", out_root=str(tmp_path),
                          synthetic_step=2.0, log=lambda *a: None,
                          training_type="load")
    np.testing.assert_array_equal(loaded.nn.predictions, preds)

    # a proba-head load over deterministic winners trips the fingerprint
    with pytest.raises(ValueError, match="different settings"):
        run_pipeline(_fast_cfg(), source="synthetic",
                     out_root=str(tmp_path), synthetic_step=2.0,
                     log=lambda *a: None, training_type="load")


def test_masked_mse_matches_numpy():
    from s2s_ismr_tpu.train.losses import masked_mse
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(4, 3, 3, 1)).astype(np.float32)
    tgt = rng.normal(size=(4, 3, 3, 1)).astype(np.float32)
    tgt[:, 0, 0, 0] = np.nan              # ocean pixel
    w = np.array([1.0, 1.0, 0.0, 1.0], np.float32)
    got = float(masked_mse(pred, tgt, w))
    per = np.array([np.nanmean((pred[i] - tgt[i]) ** 2) for i in range(4)])
    want = float((per * w).sum() / w.sum())
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_deterministic_requires_unet(tmp_path):
    cfg = _fast_cfg(output="deterministic", architecture="cnn")
    with pytest.raises(ValueError, match="deterministic"):
        run_pipeline(cfg, source="synthetic", out_root=str(tmp_path),
                     synthetic_step=2.0, log=lambda *a: None)
