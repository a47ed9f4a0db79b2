"""Round-5 probe: the op-latency roofline for the 1-lane training step.

PERF.md asserts the canonical tuning step is op-latency-bound (~80 ops,
each with fixed device overhead) but never converts that into a ceiling
(VERDICT r4 weak #3). This probe:

1. compiles the EXACT 1-lane program bench.py's serial-async mode ships
   (train_fold on the tune_ECMWF_com shape) and counts the optimized-HLO
   instructions of the inner minibatch-step computation — the real
   "op count" of one optimizer step after XLA fusion;
2. measures the per-op fixed latency empirically with unfusable op
   chains (3x3 bf16 conv chains at each U-Net level's shape: conv(x, w)
   of conv(x, w) cannot fuse or CSE) differenced across two chain
   lengths inside a fori_loop, which cancels loop overhead;
3. reports the implied ceiling steps/s = 1 / (step_ops x per_op) next
   to the measured single-lane and 20-lane serial-async steps/s.

Usage (real chip): PYTHONPATH=/root/repo:/root/.axon_site python
probes/roofline_r5.py [--fast]
"""

from __future__ import annotations

import argparse
import json
import re
import time

import numpy as np


def conv_census(hlo: str, batch: int, val_rows: int):
    """Unique convolution instructions bucketed by role and level.

    XLA's loop transformations clone instructions (`.clone.N` suffixes);
    dedupe by the numbered op id so each conv counts once. Roles:
    'step' = training minibatch fwd+dgrad (leading dim == batch),
    'wgrad' = weight-gradient convs (3x3xCinxCout outputs),
    'val' = per-epoch validation forward (leading dim == val_rows)."""
    convs = {}
    for line in hlo.splitlines():
        if " = " not in line or not re.search(r"\bconvolution\(", line):
            continue
        nm = re.search(r"%([\w\.\-]+) =", line)
        sh = re.search(r"=\s*(\w+)\[([\d,]+)\]", line)
        if not (nm and sh):
            continue
        opid = re.match(r"([\w]+\.\d+)", nm.group(1))
        convs[opid.group(1) if opid else nm.group(1)] = sh.group(2)
    out = {"step": {}, "wgrad": 0, "val": {}, "other": 0}
    for shape in convs.values():
        dims = [int(d) for d in shape.split(",")]
        if dims[0] == 3 or len(dims) == 4 and dims[0] * dims[1] <= 9:
            out["wgrad"] += 1
        elif dims[0] == batch:
            out["step"][f"H{dims[1]}"] = out["step"].get(
                f"H{dims[1]}", 0) + 1
        elif dims[0] == val_rows:
            out["val"][f"H{dims[1]}"] = out["val"].get(f"H{dims[1]}",
                                                       0) + 1
        else:
            out["other"] += 1
    out["n_unique"] = len(convs)
    return out


def parse_hlo_computations(hlo: str):
    """Per-computation instruction counts from optimized HLO text.

    Returns {name: {"n_ops": ..., "n_conv": ..., "n_fusion": ...,
    "n_dot": ...}} counting executable instructions (assignments minus
    parameters/constants/tuple plumbing)."""
    comps = {}
    name = None
    for line in hlo.splitlines():
        m = re.match(r"^(%?[\w\.\-]+)\s*(?:\([^)]*\))?\s*.*\{\s*$", line)
        if m and ("(" in line and "->" in line or line.startswith("ENTRY")):
            name = m.group(1)
            comps[name] = {"n_ops": 0, "n_conv": 0, "n_fusion": 0,
                           "n_dot": 0}
            continue
        if name is None or " = " not in line:
            continue
        rhs = line.split(" = ", 1)[1]
        # line shape: `%name = <type> opcode(operands), attrs`; tuple
        # types start with '(' so find the LAST identifier before the
        # first '(' that is not inside the type
        op = re.search(r"(?:^|\s|\})([a-z][\w\-]*)\(", rhs)
        opname = op.group(1) if op else ""
        if opname in ("parameter", "constant", "tuple",
                      "get-tuple-element", "bitcast"):
            continue
        comps[name]["n_ops"] += 1
        if "convolution" in rhs:
            comps[name]["n_conv"] += 1
        if opname == "fusion":
            comps[name]["n_fusion"] += 1
        if opname == "dot":
            comps[name]["n_dot"] += 1
    return comps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--out", default="/tmp/roofline_r5.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from s2s_ismr_tpu.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from s2s_ismr_tpu import timeutils
    from s2s_ismr_tpu.data import synthetic
    from s2s_ismr_tpu.models import UNet, UNetConfig
    from s2s_ismr_tpu.ops import terciles
    from s2s_ismr_tpu.train import splits
    from s2s_ismr_tpu.train.engine import TrainSettings, train_fold

    platform = jax.devices()[0].platform
    report = {"platform": platform}

    # ---- 1. the bench's exact 1-lane program + its HLO op counts ----
    years = (2003, 2012) if args.fast else (2003, 2018)
    epochs = 3 if args.fast else 10
    b = synthetic.synthetic_hindcast(years=years, seed=0).fillna(0.0)
    fm = splits.bootstrap_masks(b.years, n_bootstraps=2)
    wm = timeutils.week_window_matrix(1)
    labels = jax.vmap(
        lambda pm: terciles.fit_and_label(b.y, b.weeks, pm, wm, None)[0]
    )(jnp.asarray(fm.train))
    y_oh = jnp.nan_to_num(terciles.one_hot_labels(labels), nan=0.0)
    x = jnp.asarray(b.ensemble_mean()[..., None])
    model = UNet(UNetConfig(filters=2, n_blocks=3, ct_kernel=(3, 3)))
    st = TrainSettings(epochs=epochs, batch_size=16, patience=epochs,
                       val_rows=int(np.asarray(fm.val).sum(1).max()))
    T = x.shape[0]
    steps_per_lane = epochs * (-(-T // st.batch_size))

    def lane(y_oh_f, tmask, vmask, lr, key):
        _, vloss, _ = train_fold(model, x, y_oh_f, tmask, vmask, lr, key,
                                 st)
        return vloss

    lowered = jax.jit(lane).lower(y_oh[0], jnp.asarray(fm.train[0]),
                                  jnp.asarray(fm.val[0]),
                                  jnp.float32(1e-3), jax.random.key(0))
    t0 = time.perf_counter()
    compiled = lowered.compile()
    report["compile_s"] = round(time.perf_counter() - t0, 1)
    hlo = compiled.as_text()
    comps = parse_hlo_computations(hlo)
    # conv-bearing top-level computations: the largest is the training
    # step body (fwd+bwd+Adam inside the minibatch scan; its n_conv
    # counts metadata mentions too — the census below is the exact one),
    # the second the epoch tail (per-epoch val forward)
    conv_comps = {k: v for k, v in comps.items() if v["n_conv"] >= 5}
    step_name, step = max(conv_comps.items(), key=lambda kv: kv[1]["n_ops"])
    report["hlo_computations_with_convs"] = conv_comps
    report["step_body"] = {"name": step_name, **step}
    n_step_ops = step["n_ops"]
    census = conv_census(hlo, batch=st.batch_size, val_rows=st.val_rows)
    report["conv_census"] = census
    print(f"[roofline] step body {step_name}: {n_step_ops} ops; "
          f"conv census {census}", flush=True)

    # ---- 2. measured per-op latency via unfusable conv chains ----
    # shapes mirror the U-Net's levels for filters=2, n_blocks=3 on 32x32
    level_shapes = [(16, 32, 32, 8), (16, 16, 16, 16), (16, 8, 8, 32),
                    (16, 4, 4, 64)]
    M = 200 if args.fast else 2000
    K1, K2 = 8, 32
    per_op_us = {}
    for shp in level_shapes:
        N, H, _, C = shp
        key = jax.random.key(1)
        xs = (jax.random.normal(key, shp, jnp.float32) * 0.1
              ).astype(jnp.bfloat16)
        w = (jax.random.normal(key, (3, 3, C, C), jnp.float32)
             / np.sqrt(9 * C)).astype(jnp.bfloat16)

        def make(K):
            def body(i, xv):
                for _ in range(K):
                    xv = lax.conv_general_dilated(
                        xv, w, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return xv
            return jax.jit(lambda xv: lax.fori_loop(0, M, body, xv))

        times = {}
        for K in (K1, K2):
            f = make(K)
            f(xs).block_until_ready()                   # compile + warm
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                f(xs).block_until_ready()
                reps.append(time.perf_counter() - t0)
            times[K] = min(reps)
        per_op = (times[K2] - times[K1]) / ((K2 - K1) * M)
        per_op_us[f"H{H}_C{C}"] = round(per_op * 1e6, 3)
        print(f"[roofline] conv chain {shp}: {per_op * 1e6:.2f} us/op "
              f"(walls {times[K1]:.3f}/{times[K2]:.3f} s)", flush=True)
    report["per_op_us"] = per_op_us
    t_op_us = float(np.mean(list(per_op_us.values())))
    report["per_op_us_mean"] = round(t_op_us, 3)

    # ---- 3. measured step time: single-lane and 20-lane serial-async ----
    jf = compiled
    args5 = (y_oh[0], jnp.asarray(fm.train[0]), jnp.asarray(fm.val[0]),
             jnp.float32(1e-3), jax.random.key(0))
    jf(*args5).block_until_ready()                      # warm
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        jf(*args5).block_until_ready()
        reps.append(time.perf_counter() - t0)
    t_lane = min(reps)
    report["single_lane_steps_per_s"] = round(steps_per_lane / t_lane, 1)
    report["single_lane_step_us"] = round(t_lane / steps_per_lane * 1e6, 1)

    lanes = 4 if args.fast else 20
    lrs = np.tile([1e-3, 1e-4], lanes // 2 + 1)[:lanes].astype(np.float32)
    keys = jax.random.split(jax.random.key(0), lanes)
    for _ in range(2):                                  # warm + measure
        t0 = time.perf_counter()
        outs = [jf(y_oh[i % 2], jnp.asarray(fm.train[i % 2]),
                   jnp.asarray(fm.val[i % 2]), jnp.float32(lrs[i]),
                   keys[i]) for i in range(lanes)]
        jax.block_until_ready(outs)
        t_async = time.perf_counter() - t0
    async_sps = steps_per_lane * lanes / t_async
    report["serial_async_steps_per_s"] = round(async_sps, 1)
    report["serial_async_step_us"] = round(t_async * 1e6
                                           / (steps_per_lane * lanes), 1)

    # ---- 4. the roofline: component-sum ceiling ----
    # convs priced at their level's measured chain latency (they are
    # latency-bound: an H16 conv's 19 MFLOP would take ~0.1 us at peak
    # MXU but measures ~5 us); wgrad convs consume level-sized
    # activations — price at the mean conv latency; every remaining
    # top-level op (fusions, reduces, updates) at the measured minimum
    # (the H4 chain: pure per-op overhead). The val forward amortizes
    # over the epoch's n_batches steps.
    lvl = {"H32": per_op_us["H32_C8"], "H16": per_op_us["H16_C16"],
           "H8": per_op_us["H8_C32"], "H4": per_op_us["H4_C64"]}
    t_min = min(per_op_us.values())
    conv_us = sum(n * lvl.get(h, t_op_us)
                  for h, n in census["step"].items())
    wgrad_us = census["wgrad"] * t_op_us
    n_batches = -(-T // st.batch_size)
    val_us = sum(n * lvl.get(h, t_op_us)
                 for h, n in census["val"].items()) / n_batches
    n_conv_step = sum(census["step"].values()) + census["wgrad"]
    other_us = max(0, n_step_ops - n_conv_step) * t_min
    # bracket, not a point: the conv-latency-only FLOOR (every non-conv
    # op free — unreachable) vs the fully-SERIALIZED sum (every op at
    # its measured latency, zero overlap — pessimistic). The measured
    # step must land between them; its position shows how much non-conv
    # latency XLA's schedule already hides under the convs.
    floor_us = conv_us + wgrad_us + val_us
    serial_us = floor_us + other_us
    meas = report["serial_async_step_us"]
    report["ceiling_components_us"] = {
        "step_convs": round(conv_us, 1), "wgrads": round(wgrad_us, 1),
        "val_fwd_amortized": round(val_us, 1),
        "other_ops_at_min_latency": round(other_us, 1)}
    report["conv_floor_step_us"] = round(floor_us, 1)
    report["conv_floor_steps_per_s"] = round(1e6 / floor_us, 1)
    report["serialized_sum_step_us"] = round(serial_us, 1)
    report["achieved_fraction_of_conv_floor"] = round(floor_us / meas, 3)
    report["nonconv_latency_hidden_fraction"] = round(
        1.0 - (meas - floor_us) / max(other_us, 1e-9), 3)
    print(json.dumps(report, indent=1))
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()
