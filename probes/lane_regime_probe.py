"""Round-4 lane-dispatch probe (VERDICT r3 items 2+3).

Two questions, both on the real v5e at production shapes:

1. REGIME (mesh decision): the round-3 data had only L=1 and L=10/20 for
   the vmapped-lanes grouped-conv cost. The mesh path runs 2-5 vmapped
   lanes PER DEVICE at v4-8 scale (10-20 lanes / 8 devices) — measure
   L in {1,2,3,4,8} vmapped wall vs serial-async (L dispatches of the
   1-lane program) so the mesh execution model is justified by data.

2. SCAN-OVER-LANES: one jitted program that lax.scan's over stacked lane
   inputs — plain convs per iteration (no grouped-conv penalty), the
   per-lane early-exit while_loop preserved, zero per-lane dispatch, one
   compile. vs serial-async at the canonical 20-lane workload and the
   IITM_full 10-lane 64x64 shape.

Settings mirror the production sweep segment: early_exit=True so each
formulation pays its own stopping semantics (vmap runs to the max stop
epoch over its lanes; serial/scan exit per lane). Reports steps actually
run so per-step cost can be separated from early-exit savings.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python probes/lane_regime_probe.py
"""

from __future__ import annotations

import json
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def build_workload(grid_shape, years, n_blocks, folds=10, lanes=20, seed=0):
    import jax
    import jax.numpy as jnp
    from s2s_ismr_tpu import timeutils
    from s2s_ismr_tpu.data import synthetic
    from s2s_ismr_tpu.models import UNet, UNetConfig
    from s2s_ismr_tpu.ops import terciles
    from s2s_ismr_tpu.train import splits

    b = synthetic.synthetic_hindcast(
        years=years, seed=seed, grid_shape=grid_shape).fillna(0.0)
    fm = splits.bootstrap_masks(b.years, n_bootstraps=folds)
    wm = timeutils.week_window_matrix(1)
    labels = jax.vmap(
        lambda pm: terciles.fit_and_label(b.y, b.weeks, pm, wm, None)[0]
    )(jnp.asarray(fm.train))
    y_oh = jnp.nan_to_num(terciles.one_hot_labels(labels), nan=0.0)
    x = jnp.asarray(b.ensemble_mean()[..., None])

    model = UNet(UNetConfig(filters=2, n_blocks=n_blocks, ct_kernel=(3, 3)))
    lrs = np.tile([1e-3, 1e-4], lanes // 2 + 1)[:lanes].astype(np.float32)
    fold_idx = np.arange(lanes) % folds
    lane_args = (y_oh[fold_idx], jnp.asarray(fm.train[fold_idx]),
                 jnp.asarray(fm.val[fold_idx]), jnp.asarray(lrs),
                 jax.random.split(jax.random.key(0), lanes))
    val_rows = int(np.asarray(fm.val).sum(1).max())
    return model, x, lane_args, val_rows


def main():
    import jax
    import jax.numpy as jnp
    from s2s_ismr_tpu.train.engine import TrainSettings, train_fold
    from s2s_ismr_tpu.train.sweep import _compile_with_retry

    EPOCHS, PATIENCE = 20, 5

    def make_programs(model, x, lane_args, val_rows, Ls, lanes):
        st = TrainSettings(epochs=EPOCHS, batch_size=16, patience=PATIENCE,
                           val_rows=val_rows, early_exit=True)

        def lane(y_oh_f, tmask, vmask, lr, key):
            _, vloss, hist = train_fold(model, x, y_oh_f, tmask, vmask,
                                        lr, key, st)
            return vloss, jnp.sum(jnp.isfinite(hist), dtype=jnp.int32)

        def scan_lanes(y_l, tm_l, vm_l, lr_l, key_l):
            def body(carry, lane_in):
                return carry, lane(*lane_in)
            _, outs = jax.lax.scan(body, 0, (y_l, tm_l, vm_l, lr_l, key_l))
            return outs

        progs = {"serial1": (jax.jit(lane),
                             tuple(a[0] for a in lane_args))}
        for L in Ls:
            progs[f"vmap{L}"] = (jax.jit(jax.vmap(lane)),
                                 tuple(a[:L] for a in lane_args))
        progs[f"scan{lanes}"] = (jax.jit(scan_lanes), lane_args)
        return progs

    shapes = {
        "ECMWF_com_32": dict(grid_shape=(32, 32), years=(2003, 2018),
                             n_blocks=3, lanes=20, Ls=(2, 3, 4, 8, 20)),
        "IITM_full_64": dict(grid_shape=(64, 64), years=(2003, 2022),
                             n_blocks=4, lanes=10, Ls=(2, 10)),
    }

    results = {}
    for name, spec in shapes.items():
        model, x, lane_args, val_rows = build_workload(
            spec["grid_shape"], spec["years"], spec["n_blocks"],
            lanes=spec["lanes"])
        jax.block_until_ready(x)
        progs = make_programs(model, x, lane_args, val_rows,
                              spec["Ls"], spec["lanes"])
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=len(progs)) as ex:
            compiled = dict(zip(progs, ex.map(
                lambda kv: _compile_with_retry(kv[0].lower(*kv[1])),
                progs.values())))
        print(f"[{name}] compiled {len(progs)} programs in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)

        def run_serial(L, reps=2):
            for _ in range(reps):                      # warm-up + measure
                t0 = time.perf_counter()
                outs = [compiled["serial1"](*[a[i] for a in lane_args])
                        for i in range(L)]
                jax.block_until_ready(outs)
                wall = time.perf_counter() - t0
            steps = int(sum(np.asarray(o[1]) for o in outs))
            vl = np.asarray([np.asarray(o[0]) for o in outs])
            return wall, steps, vl

        def run_prog(key, args, reps=2):
            for _ in range(reps):
                t0 = time.perf_counter()
                out = compiled[key](*args)
                jax.block_until_ready(out)
                wall = time.perf_counter() - t0
            return wall, int(np.asarray(out[1]).sum()), np.asarray(out[0])

        rows = []
        agree = None        # set only when Ls includes the full lane count
        s1_wall, s1_steps, _ = run_serial(1)
        rows.append(("serial x1", 1, s1_wall, s1_steps))
        for L in spec["Ls"]:
            w, s, vlv = run_prog(f"vmap{L}", tuple(a[:L] for a in lane_args))
            rows.append((f"vmap{L}", L, w, s))
            ws, ss, vls = run_serial(L)
            rows.append((f"serial x{L}", L, ws, ss))
            if L == spec["lanes"]:
                agree = float(np.abs(vlv - vls).max())
        w, s, vlc = run_prog(f"scan{spec['lanes']}", lane_args)
        rows.append((f"scan{spec['lanes']}", spec["lanes"], w, s))
        _, _, vls_full = run_serial(spec["lanes"], reps=1)
        scan_agree = float(np.abs(vlc - vls_full).max())

        print(f"\n[{name}] epochs={EPOCHS} patience={PATIENCE} "
              f"early_exit=True  x={tuple(x.shape)}")
        print(f"{'formulation':<14}{'lanes':>6}{'wall s':>9}{'steps':>8}"
              f"{'steps/s':>9}{'wall/serial':>12}")
        serial_walls = {r[1]: r[2] for r in rows if r[0].startswith("serial")}
        for nm, L, w, s in rows:
            rel = w / serial_walls[L] if L in serial_walls else float("nan")
            print(f"{nm:<14}{L:>6}{w:>9.2f}{s:>8}{s / w:>9.0f}{rel:>12.2f}")
        print(f"max |dvloss| vmap-vs-serial @ {spec['lanes']} lanes: "
              f"{'n/a' if agree is None else format(agree, '.2e')}; "
              f"scan-vs-serial: {scan_agree:.2e}", flush=True)
        results[name] = rows

    with open("/tmp/lane_regime_probe.json", "w") as f:
        json.dump({k: [list(r) for r in v] for k, v in results.items()}, f)


if __name__ == "__main__":
    main()
