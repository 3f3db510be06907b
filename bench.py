"""Benchmark: audio-seconds of speech processed per second per chip.

North-star metric (BASELINE.json): audio-seconds/s/chip for forward-backward
training (loss + grad + update) on the flagship triphone-state CRF, plus
Viterbi decode throughput as a secondary line.

No published reference numbers exist (BASELINE.md provenance); the recorded
baseline is this framework's own round-1 pure-lax.scan number on one TPU v5e
chip (36 ms/step at B=64 T=512 L=48x3 D=144), so ``vs_baseline`` tracks
self-improvement across rounds.

Timing note: ``block_until_ready`` is unreliable over this environment's
remote-TPU tunnel (returns before completion), so every timed region ends
with a host-side ``float()`` fetch of a value data-dependent on the whole
step chain.

Prints ONE JSON line (last): {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

# Round-1 self-baseline (lax.scan path, TPU v5e, B=64 T=512 48x3 states).
BASELINE_AUDIO_S_PER_S = 9100.0

B, T = 128, 512      # train bench batch (fixed per-frame cost amortizes)
DECODE_B = 64
FRAME_S = 0.01  # 10 ms frames
# flagship train precision: manual 3-pass split-float matmuls (~2^-16 rel
# err; loss matches fp32 to 7 digits at the bench shape — tests/kernels/
# test_fdt_pallas.py::test_bf16x3_precision_close_to_highest records the
# bound).  bench reports the fp32 number alongside in aux.
TRAIN_PRECISION = "bf16x3"


def bench_train_step(calls=6, spc=8, warmup=1, B=B, precision=None):
    """Production driver: K=spc optimizer steps fused per dispatch
    (TrainConfig.steps_per_call).  Timed by DIFFERENCING two call counts
    (calls and calls//3): the remote-TPU tunnel charges a ~24 ms
    dispatch+fetch round trip per synced region (measured r4,
    runs/profile_fdt.py) which would otherwise inflate every step by
    round_trip/(calls*spc); the difference cancels it exactly, reporting
    true device time per step — what a locally-attached host would see."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship, _tiny_batch
    from asr_craft_tpu.train import TrainConfig, make_train_step

    cfg = _flagship()
    if precision:
        cfg = dataclasses.replace(cfg, precision=precision)
    tc = TrainConfig(lr=0.1, steps_per_call=spc)
    params = cfg.init_params(scale=0.01)
    step_fn, opt = make_train_step(cfg, tc)
    opt_state = opt.init(params)
    avg = params
    batch = _tiny_batch(cfg, B=B, T=T)
    stacked = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (spc,) + x.shape), batch)
    lr = jnp.float32(tc.lr)

    for _ in range(warmup):
        params, opt_state, avg, ms = step_fn.multi_step(
            params, opt_state, avg, stacked, lr)
    # precision-parity probe: loss after the warmup call's spc steps is at
    # the same training point regardless of how many timed calls follow
    loss_w = float(ms["loss"][-1])

    def run(k):
        nonlocal params, opt_state, avg, ms
        t0 = time.perf_counter()
        for _ in range(k):
            params, opt_state, avg, ms = step_fn.multi_step(
                params, opt_state, avg, stacked, lr)
        float(ms["loss"][-1])   # host fetch: forces the dependency chain
        return time.perf_counter() - t0

    lo_calls = max(calls // 3, 1)
    lo = min(run(lo_calls) for _ in range(2))
    hi = min(run(calls) for _ in range(2))
    dt = max(hi - lo, 1e-9) / ((calls - lo_calls) * spc)
    return B * T * FRAME_S / dt, dt, loss_w


def bench_train_epoch_loader(n_utts=512, precision=TRAIN_PRECISION):
    """Steady-state training with the real bucketing UtteranceLoader
    feeding the chip (VERDICT r2 weak #7: resident-batch numbers hide
    host-side stalls).  Returns audio-s/s over the second epoch (first
    epoch pays compiles)."""
    import dataclasses
    import jax
    from __graft_entry__ import _flagship
    from asr_craft_tpu import data
    from asr_craft_tpu.train import TrainConfig, Trainer
    from asr_craft_tpu.utils.logging import MetricsLogger

    cfg = dataclasses.replace(_flagship(), precision=precision)
    scfg = data.SyntheticConfig(num_labels=48, feat_dim=cfg.feat_dim,
                                noise=0.3, min_len=300, max_len=512, seed=3)
    feats, labels, _ = data.generate_corpus(scfg, n_utts)
    loader = data.UtteranceLoader(
        feats, labels, data.LoaderConfig(batch_size=B, buckets=(512,),
                                         shuffle=True))
    tr = Trainer(cfg, TrainConfig(lr=0.1, steps_per_call=8,
                                  log_every=10_000),
                 logger=MetricsLogger(quiet=True))
    tr.train_epoch(loader)                       # compile epoch
    t0 = time.perf_counter()
    rec = tr.train_epoch(loader)
    dt = time.perf_counter() - t0
    audio_s = rec["frames"] * FRAME_S if "frames" in rec else \
        sum(len(l) for l in labels) * FRAME_S
    return audio_s / dt


def bench_decode(steps=30, warmup=3):
    import jax
    from __graft_entry__ import _flagship, _tiny_batch
    from asr_craft_tpu.models.crf import decode

    cfg = _flagship()
    params = cfg.init_params(scale=0.01)
    batch = _tiny_batch(cfg, B=DECODE_B, T=T)

    # chain steps through the feats so the timed loop is data-dependent
    @jax.jit
    def step(p, feats, lengths):
        phones, _, scores = decode(cfg, p, feats, lengths)
        return feats + 0.0 * scores[:, None, None], phones

    feats = batch["feats"]
    for _ in range(warmup):
        feats, phones = step(params, feats, batch["lengths"])
    float(feats[0, 0, 0])

    def run(k):
        nonlocal feats
        t0 = time.perf_counter()
        for _ in range(k):
            feats, _ = step(params, feats, batch["lengths"])
        float(feats[0, 0, 0])
        return time.perf_counter() - t0

    lo_steps = max(steps // 3, 1)
    lo = min(run(lo_steps) for _ in range(2))
    hi = min(run(steps) for _ in range(2))
    dt = max(hi - lo, 1e-9) / (steps - lo_steps)
    return DECODE_B * T * FRAME_S / dt, dt


def bench_decode_floor(Ts=(64, 256, 512), steps=12):
    """Measured decode latency-floor model (VERDICT r2 next #4): a T-sweep
    of the fused decode at the bench batch isolates the per-frame serial
    cost b in t(T) = a + b*T (a absorbs per-launch device constants; the
    tunnel round trip is differenced out — see bench_train_step).
    The roofline's byte/FLOP SOL has no term for the 512-frame sequential
    dependency chain; this measures it, so "latency-floor-bound" becomes a
    checked quantitative claim: pct_of_model compares the full-T
    measurement against the fit."""
    import jax
    from __graft_entry__ import _flagship, _tiny_batch
    from asr_craft_tpu.models.crf import decode

    cfg = _flagship()
    params = cfg.init_params(scale=0.01)
    times = {}
    for T in Ts:
        batch = _tiny_batch(cfg, B=DECODE_B, T=T)

        @jax.jit
        def step(p, feats, lengths):
            phones, _, scores = decode(cfg, p, feats, lengths)
            return feats + 0.0 * scores[:, None, None]

        feats = batch["feats"]
        feats = step(params, feats, batch["lengths"])
        float(feats[0, 0, 0])

        def run(k):
            nonlocal feats
            t0 = time.perf_counter()
            for _ in range(k):
                feats = step(params, feats, batch["lengths"])
            float(feats[0, 0, 0])
            return time.perf_counter() - t0

        # differenced (tunnel round trip cancelled) + min-of-2 vs jitter
        lo_s = max(steps // 3, 1)
        lo = min(run(lo_s), run(lo_s))
        hi = min(run(steps), run(steps))
        times[T] = max(hi - lo, 1e-9) / (steps - lo_s)
    ts = np.asarray(list(times.keys()), np.float64)
    ys = np.asarray([times[t] for t in times], np.float64)
    b, a = np.polyfit(ts, ys, 1)
    fit = a + b * ts
    ss_res = float(np.sum((ys - fit) ** 2))
    ss_tot = float(np.sum((ys - ys.mean()) ** 2))
    Tmax = max(Ts)
    return {
        "per_frame_us": round(b * 1e6, 3),
        "intercept_ms": round(a * 1e3, 3),
        "r2": round(1 - ss_res / max(ss_tot, 1e-30), 4),
        "measured_ms": {int(t): round(times[t] * 1e3, 3) for t in times},
        "pct_of_model": round(100 * (a + b * Tmax) / times[Tmax], 1),
    }


def bench_scrf(steps=6):
    """Segmental-CRF production shape (B=128 T=512 L=48 Dmax=16 — 17 GB if
    the (B,T,Dmax,L) tensor were materialized): train step + streaming
    decode, slope-timed, with the r5 segmental roofline phases and tile
    floor (VERDICT r4 next #1) and a decode T-sweep floor fit.

    B=128 fills the transposed kernels' lane dimension exactly (r5:
    half-empty lanes at B=64 measured SLOWER in absolute terms than
    B=128 — runs/profile_scrf.py fwd/vit variants)."""
    import jax
    import jax.numpy as jnp
    import optax
    from asr_craft_tpu.models.segmental import (SegCrfConfig,
                                                scrf_decode,
                                                scrf_loss_fused)
    from asr_craft_tpu.utils import roofline as rl

    Bs, Ts, L, D, Dmax = 128, 512, 48, 144, 16
    cfg = SegCrfConfig(num_labels=L, feat_dim=D, max_dur=Dmax)
    params = cfg.init_params()
    rng = np.random.default_rng(0)
    feats0 = jnp.asarray(rng.normal(size=(Bs, Ts, D)), jnp.float32)
    runs = np.repeat(rng.integers(0, L, size=(Bs, Ts // 4)), 4, axis=1)
    labels = jnp.asarray(runs[:, :Ts], jnp.int32)
    lengths = jnp.full((Bs,), Ts, jnp.int32)
    opt = optax.sgd(0.05)

    # the chain runs through params (the real training dependency — new
    # batches are independent inputs); chaining feats through the loss
    # was measured to add ~1.5 ms of artificial serialization + copy.
    # SPC steps are FUSED per dispatch, python-UNROLLED in one jit:
    # per-dispatch RPC gaps over the remote-TPU tunnel (~2 ms/call at
    # this shape, r5) do NOT cancel in the lo/hi differencing — only the
    # final fetch does.  Unrolled, not lax.scan: the while-loop form
    # measured 4.5 vs 2.5 ms/step interleaved (XLA pipelines DMA across
    # unrolled steps but not across loop iterations).
    SPC = 8
    import functools as _ft

    def _one(c):
        p, s = c
        loss, g = jax.value_and_grad(
            lambda q: scrf_loss_fused(cfg, q, feats0, labels,
                                      lengths)[0])(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s

    stepk = jax.jit(lambda c: _ft.reduce(lambda cc, _: _one(cc),
                                         range(SPC), c))

    def slope(fn, state, k=steps, per_call=1):
        state = fn(state)              # warm/compile
        _fetch(state)

        def run(n):
            nonlocal state
            t0 = time.perf_counter()
            for _ in range(n):
                state = fn(state)
            _fetch(state)
            return time.perf_counter() - t0

        lo_n = max(k // 3, 1)
        lo = min(run(lo_n), run(lo_n))
        hi = min(run(k), run(k))
        return max(hi - lo, 1e-9) / ((k - lo_n) * per_call)

    def _fetch(state):
        leaf = jax.tree.leaves(state)[0]
        float(np.asarray(leaf.reshape(-1)[0]))

    opt_state = opt.init(params)
    train_dt = slope(stepk, (params, opt_state), per_call=SPC)

    DEC_SPC = 4

    def _dec_one(f, lx):
        starts, labs, n, scores = scrf_decode(cfg, params, f, lx)
        # chain on ALL outputs — n/starts/labs force the traceback +
        # marker packing (scores alone lets XLA DCE them)
        force = (scores + jnp.sum(starts[:, :1] + labs[:, :1],
                                  axis=-1) + n).astype(jnp.float32)
        return f + 0.0 * force[:, None, None]

    deck = jax.jit(lambda f: _ft.reduce(
        lambda ff, _: _dec_one(ff, lengths), range(DEC_SPC), f))
    dec_dt = slope(deck, feats0, per_call=DEC_SPC)

    # decode floor: T-sweep of the streaming decode (VERDICT r3 weak #3);
    # 3 points keep the whole bench under the driver's budget
    times = {}
    for Tx in (64, 256, 512):
        fx = feats0[:, :Tx]
        lx = jnp.full((Bs,), Tx, jnp.int32)

        dx = jax.jit(lambda f, lx=lx: _ft.reduce(
            lambda ff, _: _dec_one(ff, lx), range(DEC_SPC), f))
        times[Tx] = slope(dx, fx, per_call=DEC_SPC)
    ts = np.asarray(list(times), np.float64)
    ys = np.asarray([times[t] for t in times], np.float64)
    b, a = np.polyfit(ts, ys, 1)
    fit = a + b * ts
    r2 = 1 - float(np.sum((ys - fit) ** 2)) / max(
        float(np.sum((ys - ys.mean()) ** 2)), 1e-30)

    bw = rl.measure_stream_bw()
    # in-kernel (Mosaic, VMEM-resident) elementwise rate: the XLA-chain
    # measure_vpu_geps swings >2x between runs over the tunnel; the
    # Pallas microkernel calibration is stable to ~8% (r5)
    vpu = rl.measure_vpu_geps_pallas(Dmax=Dmax) or rl.measure_vpu_geps()
    tr_ph = rl.scrf_train_phases(Bs, Ts, L, D, Dmax)
    dec_ph = rl.scrf_decode_phases(Bs, Ts, L, D, Dmax)
    rl_train = rl.summarize(tr_ph, train_dt, measured_bw_gbps=bw,
                            mode="bf16", vpu_geps=vpu)
    rl_dec = rl.summarize(dec_ph, dec_dt, measured_bw_gbps=bw,
                          vpu_geps=vpu)
    # defended floor (VERDICT r4 next #1): exact kernel pass inventories
    # at measured VPU throughput + the byte-bound prep/finish phase SOLs
    tile = rl.scrf_tile_floor(Bs, Ts, L, Dmax, vpu_geps=vpu)
    aux_sol = lambda ph, names: sum(
        p.sol_s(bw_gbps=bw, vpu_geps=vpu) for p in ph
        if p.name in names)
    floor_train = tile["train_floor_ms"] / 1e3 + aux_sol(
        tr_ph, ("scrf_prep", "scrf_numerator", "scrf_grad_finish"))
    floor_dec = tile["decode_floor_ms"] / 1e3 + aux_sol(
        dec_ph, ("scrf_prep",))
    tile["train_floor_total_ms"] = round(floor_train * 1e3, 3)
    tile["decode_floor_total_ms"] = round(floor_dec * 1e3, 3)
    tile["train_pct_of_floor"] = round(100.0 * floor_train / train_dt, 1)
    tile["decode_pct_of_floor"] = round(100.0 * floor_dec / dec_dt, 1)
    return {
        "train_ms": round(train_dt * 1e3, 3),
        "train_audio_s_per_s": round(Bs * Ts * FRAME_S / train_dt, 1),
        "decode_ms": round(dec_dt * 1e3, 3),
        "decode_audio_s_per_s": round(Bs * Ts * FRAME_S / dec_dt, 1),
        "decode_floor": {
            "per_frame_us": round(b * 1e6, 3),
            "intercept_ms": round(a * 1e3, 3), "r2": round(r2, 4),
            "measured_ms": {int(t): round(times[t] * 1e3, 3)
                            for t in times}},
        "roofline_train": rl_train,
        "roofline_decode": rl_dec,
        "tile_floor": tile,
    }


def bench_roofline(train_dt, decode_dt):
    """Quantified speed-of-light (VERDICT r1 Next #3): modeled HBM traffic /
    MXU FLOPs per step vs chip peaks and empirically measured stream BW."""
    from __graft_entry__ import _flagship
    from asr_craft_tpu.utils import roofline as rl

    cfg = _flagship()
    L = cfg.num_labels * cfg.num_states
    D = cfg.feat_dim
    bw = rl.measure_stream_bw()
    vpu = rl.measure_vpu_geps()
    mode = {"bf16x3": "bf16x3", "default": "bf16"}.get(TRAIN_PRECISION,
                                                       "fp32")
    if cfg.fmap.frame_dependent_trans:
        train_ph = rl.fdt_train_phases(B, T, L, D, cfg.num_states)
        dec_ph = rl.fdt_decode_phases(DECODE_B, T, L, D, cfg.num_states)
    else:
        train_ph = rl.train_step_phases(B, T, L, D)
        dec_ph = rl.decode_phases(DECODE_B, T, L, D,
                                  num_states=cfg.num_states)
    train = rl.summarize(train_ph, train_dt, measured_bw_gbps=bw,
                         mode=mode, vpu_geps=vpu)
    dec = rl.summarize(dec_ph, decode_dt, measured_bw_gbps=bw)
    if cfg.fmap.frame_dependent_trans:
        # MXU-pass-exact defended floor (r4): the idealized SOL is capped
        # by 128-wide K/N tile padding; this is the achievable bound
        floor = rl.fdt_tile_floor(B, T, L, D, cfg.num_states, mode=mode,
                                  vpu_geps=vpu)
        train["tile_floor"] = floor
        train["pct_of_tile_floor"] = round(
            100.0 * floor["floor_ms"] / (train_dt * 1e3), 1)
    return train, dec


def bench_scaling(per_device_batch=16, T=T, steps=6, check=False):
    """Weak-scaling harness (VERDICT r3 weak #5 / next #6): audio-s/s of
    the DP-sharded flagship train step at 1..N devices, per-device batch
    held fixed; efficiency = tput(n) / (n * tput(1)).  On a pod this is
    THE ≥80%-scaling measurement (one command: ``python bench.py
    --scaling``); on this environment's single chip only n=1 runs, and
    the 8-device forced CPU mesh exercises the mechanics (CPU devices
    share host cores, so efficiency there asserts plumbing, not speed —
    runs/fill_baseline.py scaling_mechanics records it).

    ``check`` (``--scaling --check``, VERDICT r4 next #8): per device
    count, assert the DP-sharded loss AND grads equal the single-device
    values on the SAME global batch (fp32-tiered tolerance: DP psum
    reorders the batch reduction), so the first real pod run validates
    numerics and measures efficiency in one command."""
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship, _tiny_batch
    from asr_craft_tpu.models.crf import crf_loss
    from asr_craft_tpu.parallel.mesh import (make_batch_put, make_mesh,
                                             replicate_tree)
    from asr_craft_tpu.train import TrainConfig, make_train_step

    ndev = len(jax.devices())
    ns = [n for n in (1, 2, 4, 8, 16, 32, 64) if n <= ndev]
    cfg = _flagship()
    tc = TrainConfig(lr=0.1, steps_per_call=4)
    rows = {}
    base = None

    def _check_numerics(mesh, put, n, hb):
        p0 = cfg.init_params(scale=0.01)
        lg = jax.jit(jax.value_and_grad(lambda p, b: crf_loss(
            cfg, p, b["feats"], b["labels"], b["lengths"])[0]))
        loss_1, g_1 = lg(p0, jax.device_put(
            {k: jnp.asarray(v) for k, v in hb.items()},
            jax.devices()[0]))
        loss_n, g_n = lg(replicate_tree(mesh, p0), put(hb))
        loss_rel = abs(float(loss_n) - float(loss_1)) / max(
            abs(float(loss_1)), 1e-30)
        gmax = 0.0
        for a, b in zip(jax.tree.leaves(g_1), jax.tree.leaves(g_n)):
            a, b = np.asarray(a), np.asarray(b)
            # scale-relative: |a-b|_inf over the leaf's own magnitude —
            # elementwise relative error on near-zero entries only
            # measures psum reassociation noise, not wrongness
            gmax = max(gmax, float(np.max(np.abs(a - b))
                                   / max(float(np.max(np.abs(a))), 1e-30)))
        ok = loss_rel < 1e-5 and gmax < 1e-4
        return {"loss_rel": float(f"{loss_rel:.3g}"),
                "grad_max_rel": float(f"{gmax:.3g}"), "ok": bool(ok)}

    for n in ns:
        mesh = make_mesh(n)
        put = make_batch_put(mesh)
        params = replicate_tree(mesh, cfg.init_params(scale=0.01))
        step_fn, opt = make_train_step(cfg, tc)
        opt_state = replicate_tree(mesh, opt.init(params))
        avg = params
        B = per_device_batch * n
        hb = _tiny_batch(cfg, B=B, T=T)
        batch = put(hb)
        stacked = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (4,) + x.shape), batch)
        lr = jnp.float32(tc.lr)

        def run(k):
            nonlocal params, opt_state, avg
            t0 = time.perf_counter()
            for _ in range(k):
                params, opt_state, avg, ms = step_fn.multi_step(
                    params, opt_state, avg, stacked, lr)
            float(np.asarray(ms["loss"][-1]))
            return time.perf_counter() - t0

        run(1)                                  # compile
        lo = min(run(max(steps // 3, 1)) for _ in range(2))
        hi = min(run(steps) for _ in range(2))
        dt = max(hi - lo, 1e-9) / ((steps - max(steps // 3, 1)) * 4)
        tput = B * T * FRAME_S / dt
        if base is None:
            base = tput
        rows[n] = {"audio_s_per_s": round(tput, 1),
                   "ms_per_step": round(dt * 1e3, 3),
                   "efficiency": round(tput / (n * base), 3)}
        if check:
            rows[n]["check"] = _check_numerics(mesh, put, n, hb)
    if check:
        rows["check_ok"] = all(rows[n]["check"]["ok"] for n in ns)
    return rows


def main():
    import sys
    if "--scaling" in sys.argv:
        print(json.dumps(
            {"scaling": bench_scaling(check="--check" in sys.argv)}))
        return
    train_tput, train_dt, loss = bench_train_step(precision=TRAIN_PRECISION)
    # fp32 (HIGHEST) reference point: the parity-bar precision, and the
    # loss delta between the modes at the bench shape
    f32_tput, f32_dt, f32_loss = bench_train_step(calls=3,
                                                  precision="highest")
    loader_tput = bench_train_epoch_loader()
    decode_tput, decode_dt = bench_decode()
    floor = bench_decode_floor()
    rl_train, rl_dec = bench_roofline(train_dt, decode_dt)
    scrf = bench_scrf()
    print(json.dumps({"decode_floor": floor}))
    print(json.dumps({"roofline_train": rl_train}))
    print(json.dumps({"roofline_decode": rl_dec}))
    print(json.dumps({"scrf": scrf}))
    print(json.dumps({"aux": {"decode_audio_s_per_s": round(decode_tput, 1),
                              "B": B, "T": T, "decode_B": DECODE_B,
                              "train_precision": TRAIN_PRECISION,
                              "loader_epoch_audio_s_per_s":
                                  round(loader_tput, 1),
                              "train_fp32_audio_s_per_s": round(f32_tput, 1),
                              "train_loss_delta_vs_fp32":
                                  round(abs(loss - f32_loss), 8),
                              "train_pct_of_sol": rl_train["pct_of_sol"],
                              "decode_pct_of_sol": rl_dec["pct_of_sol"],
                              "scrf_train_pct_of_sol":
                                  scrf["roofline_train"]["pct_of_sol"],
                              "scrf_decode_pct_of_sol":
                                  scrf["roofline_decode"]["pct_of_sol"]}}))
    print(json.dumps({
        "metric": "train_audio_s_per_s_per_chip",
        "value": round(train_tput, 1),
        "unit": "audio-seconds/s/chip",
        "vs_baseline": round(train_tput / BASELINE_AUDIO_S_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
