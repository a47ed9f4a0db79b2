"""--batch-size override incl. the 'full' (bs=T) throughput mode.

Full-batch training was measured at 4.3x step utilization on the v5e
(PERF.md) but changes SGD semantics (1 step/epoch), so it is an explicit
non-parity opt-in — these tests pin the sentinel resolution and the CLI
wiring, not skill parity.
"""

import numpy as np
import pytest

from s2s_ismr_tpu import run as cli
from s2s_ismr_tpu.pipelines.tune import resolve_batch_sizes
from s2s_ismr_tpu.train.sweep import TuningGrid


def test_resolve_batch_sizes_sentinel():
    g = TuningGrid(batch_sizes=(0,), learning_rates=(1e-3,))
    r = resolve_batch_sizes(g, 257)
    assert r.batch_sizes == (257,)
    # non-sentinel grids pass through unchanged (same object semantics)
    g2 = TuningGrid(batch_sizes=(16, 32))
    assert resolve_batch_sizes(g2, 257) is g2
    # dedupe when T collides with an explicit size
    g3 = TuningGrid(batch_sizes=(16, 0))
    assert resolve_batch_sizes(g3, 16).batch_sizes == (16,)
    assert resolve_batch_sizes(g3, 99).batch_sizes == (16, 99)


def test_cli_rejects_nonpositive_batch_size():
    with pytest.raises(SystemExit):
        cli.main(["tune_ECMWF_com", "--synthetic", "--fast", "--cpu",
                  "--batch-size", "0"])
    with pytest.raises(SystemExit):
        cli.main(["tune_ECMWF_com", "--synthetic", "--fast", "--cpu",
                  "--batch-size", "-4"])


def test_full_batch_is_one_step_per_epoch():
    """bs=T => a single optimizer step per epoch; masked weights still
    restrict learning to the train rows (loss finite, params move)."""
    import jax
    import jax.numpy as jnp
    from s2s_ismr_tpu.train.engine import TrainSettings, train_fold
    from s2s_ismr_tpu.models import UNet, UNetConfig

    T, H = 40, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(T, H, H, 1)), jnp.float32)
    y = jax.nn.one_hot(jnp.asarray(rng.integers(0, 3, (T, H, H))), 3)
    tmask = jnp.asarray(np.arange(T) < 30)
    vmask = ~tmask
    model = UNet(UNetConfig(filters=1, n_blocks=2))
    st = TrainSettings(epochs=3, batch_size=T, patience=3)
    best, vloss, hist = jax.jit(
        lambda: train_fold(model, x, y, tmask, vmask, 1e-3,
                           jax.random.key(0), st))()
    assert np.isfinite(np.asarray(vloss))
    assert np.isfinite(np.asarray(hist)).all()
    init = model.init(jax.random.key(1), x[:1], train=False)
    moved = jax.tree.map(lambda a, b: np.any(np.asarray(a) != np.asarray(b)),
                         best["params"], init["params"])
    assert any(jax.tree.leaves(moved))


@pytest.mark.slow
def test_cli_batch_size_full_end_to_end(tmp_path):
    """`run tune_* --batch-size full` completes and records bs=T winners."""
    import json
    rc = cli.main(["tune_ECMWF_com", "--synthetic", "--fast", "--cpu",
                   "--batch-size", "full", "--epochs", "2", "--folds", "2",
                   "--out", str(tmp_path)])
    assert rc == 0
    models_dir = list((tmp_path / "models").rglob("winners_*.json"))
    assert models_dir, "winner manifest missing"
    manifest = json.loads(models_dir[0].read_text())
    bss = {e["hparams"]["batch_size"] for e in manifest}
    assert len(bss) == 1
    assert bss.pop() > 32          # resolved to T, not a grid default
