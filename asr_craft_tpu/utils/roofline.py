"""Roofline model for the DP hot paths: how far from speed-of-light are we?

VERDICT.md (round 1, Next #3) required that "speed-of-light" stop being an
assertion: per kernel, count bytes streamed to/from HBM and MXU FLOPs, derive
a SOL time from chip peaks, and print "X% of memory-bound SOL" from bench.py.

Model
-----
Every phase of the train/decode step is characterized by (bytes moved between
HBM and VMEM, MXU FLOPs).  Its speed-of-light time is

    sol = max(bytes / HBM_bandwidth, flops / MXU_peak)

and phases execute serially (each consumes the previous one's output), so the
step SOL is the sum.  The byte counts mirror the *actual* implementation —
padded kernel shapes (L rounded up to the 128-lane tile, T to the 8-frame
block), the broadcast label planes the dual kernels stream, and the XLA-side
gradient-assembly reads — not an idealized algorithm.  That makes the model
an honest account of this code, and doubles as a traffic budget: a phase
whose modeled bytes shrink is a real optimization target.

Caveat (documented, not modeled): the alpha/beta scans are sequential in T
(T/8 grid steps, 8 unrolled frames each), so at small B·L a latency floor —
per-frame MXU issue + VPU logsumexp dependency chains — can sit above the
bandwidth bound.  The gap between measured time and SOL at the flagship
shape is attributed to exactly this serial floor plus pipeline bubbles;
``measure_stream_bw`` pins down the achievable-bandwidth part empirically.

Peaks: TPU v5e (v5 lite) — 197 bf16 TFLOP/s on the MXU, 819 GB/s HBM.  The
DP kernels run fp32 (parity bar, BASELINE.md); fp32 matmul emulated via
bf16x6 passes is ~197/6 TFLOP/s.  All phases here are far from compute-bound
either way.

Reference: the C++ toolkit's per-frame node loops (SURVEY.md §3.1,
``CRF_StateNode::computeAlpha``/``computeExpF``) have no analogue of this —
single-core scalar code is latency-bound thousands of times below any
roofline; this module exists because the TPU build is held to the chip bar.
"""
from __future__ import annotations

import dataclasses
import time

__all__ = ["ChipSpec", "Phase", "V5E", "train_step_phases",
           "fdt_train_phases", "decode_phases", "fdt_decode_phases",
           "scrf_train_phases", "scrf_decode_phases", "summarize",
           "measure_stream_bw", "measure_vpu_geps"]

_LANE = 128
_TBLOCK = 8
_SUBLANE = 8
_F32 = 4


def _up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    hbm_gbps: float        # HBM bandwidth, GB/s
    fp32_tflops: float     # MXU fp32 (HIGHEST precision) TFLOP/s
    bf16_tflops: float


V5E = ChipSpec(name="TPU v5e", hbm_gbps=819.0, fp32_tflops=197.0 / 6,
               bf16_tflops=197.0)


@dataclasses.dataclass(frozen=True)
class Phase:
    name: str
    bytes: float
    flops: float
    # VPU element-operations on the critical path (elementwise adds/maxes/
    # exps over kernel registers — the DP recursions' non-MXU work).  0 for
    # phases whose cost is bytes/MXU only.  Held to a MEASURED elementwise
    # throughput (measure_vpu_geps), so "latency/VPU-bound" phases get a
    # quantitative third roofline term instead of an asserted caveat.
    vpu_elems: float = 0.0

    def sol_s(self, spec: ChipSpec = V5E, bw_gbps: float | None = None,
              fp32: bool = True, mode: str | None = None,
              vpu_geps: float | None = None) -> float:
        bw = (bw_gbps or spec.hbm_gbps) * 1e9
        mode = mode or ("fp32" if fp32 else "bf16")
        peak = {"fp32": spec.fp32_tflops, "bf16": spec.bf16_tflops,
                "bf16x3": spec.bf16_tflops / 3.0}[mode] * 1e12
        sol = max(self.bytes / bw, self.flops / peak)
        if vpu_geps and self.vpu_elems:
            sol = max(sol, self.vpu_elems / (vpu_geps * 1e9))
        return sol


def train_step_phases(B: int, T: int, L: int, D: int,
                      n_lambda: int | None = None) -> list[Phase]:
    """Traffic/FLOP model of one flagship train step (loss + grad + update):
    dense feature map -> dual-lattice Pallas alpha/beta kernels
    (kernels/dual_pallas.py) -> classical-gradient assembly (ops/mxu.py
    _make_nll_dual bwd) -> optimizer.  Shapes follow the code, including
    tile padding and the (T, B, 128) broadcast label planes."""
    Tp, Bp, Lp = _up(T, _TBLOCK), _up(B, _SUBLANE), _up(L, _LANE)
    tbl = T * B * L * _F32           # one unpadded DP tensor
    tblp = Tp * Bp * Lp * _F32       # one padded DP tensor
    lab = Tp * Bp * _LANE * _F32     # broadcast int32 label plane
    btd = B * T * D * _F32
    n_lambda = n_lambda or (D * L + L * L + 2 * L)

    phases = [
        # potentials: feats @ W (one MXU matmul), transpose to time-major,
        # pad to kernel tiles (read unpadded + write padded).
        Phase("featuremap", btd + tbl + tbl + tblp, 2.0 * B * T * D * L),
        # dual alpha kernel: state in, labels in, (af, ac) out; per frame a
        # (2B, L) @ (L, L) rescaled-exp matmul.
        Phase("dual_forward", tblp + lab + 2 * tblp,
              2.0 * Tp * (2 * Bp) * Lp * Lp),
        # fused beta + gradient kernel (dual_pallas.backward_dual_grad):
        # cur+next state blocks (2x read), labels 2x, alphas af + ac in,
        # g_state out (+ unpad/transpose round-trip), UV accumulated in
        # VMEM; per frame the beta matmul AND the xi (L, B)x(B, L) matmul
        # for both lattices.  Betas never touch HBM.
        Phase("dual_backward_grad",
              2 * tblp + 2 * lab + 2 * tblp + tblp + tblp + tbl,
              2.0 * 2 * Tp * (2 * Bp) * Lp * Lp),
        # feature-map backward: dW = feats^T @ g_state.
        Phase("featuremap_bwd", btd + tbl, 2.0 * B * T * D * L),
        # optimizer update on the flat lambda vector (negligible).
        Phase("optimizer", 8 * n_lambda * _F32, 4.0 * n_lambda),
    ]
    return phases


def fdt_train_phases(B: int, T: int, L: int, D: int, ns: int,
                     n_lambda: int | None = None) -> list[Phase]:
    """Traffic/FLOP model of the frame-dependent-transition train step
    (kernels/fdt_pallas.py): plane formation rides the in-kernel MXU, so
    the step is MXU-FLOP-bound, not bandwidth-bound.  Shapes follow the
    code: P8 = ceil8(P), R = 3*ns*P8 + P8^2 rows, Du8 = ceil8(D+1) columns
    (bias column), Bk = ceil64(B), fwd TB=8 / bwd TB=4 with one extra
    contraction slot per bwd block.

    Caveat (documented, not modeled): the per-frame cross-phone logsumexp
    ((P8, P8, 2Bk) page reductions) is VPU work on the critical path and
    adds a latency floor the FLOP count does not see.
    """
    P = L // ns
    P8 = _up(P, _SUBLANE)
    LP = ns * P8
    R = 3 * LP + P8 * P8
    Du8 = _up(D + 2, _SUBLANE)
    Bk = _up(B, 64)
    Tp = _up(T, _TBLOCK)
    nb_bwd = Tp // 4
    btd = B * T * D * _F32
    xu = Tp * Du8 * Bk * _F32          # one kernel's transposed feat stream
    lab = Tp * _SUBLANE * Bk * _F32
    alphas = Tp * LP * 2 * Bk * _F32
    wall = R * Du8 * _F32
    n_lambda = n_lambda or (D * L + D * L * L + L + L * L)

    form = 2.0 * R * Du8 * Bk * Tp               # plane formation matmuls
    contract = 2.0 * R * Du8 * 5 * Bk * nb_bwd   # dW, (TB+1)=5 slots @ TB=4

    # VPU element-op counts per frame (order-of-magnitude, counted from the
    # kernel bodies): the cross-phone block touches (P8, P8, 2Bk) elements
    # ~5x in the fwd lse (add, max, exp, sum, accumulate) and ~7x in the
    # fused bwd (beta lse + xi emission); the (LP, 2Bk) rows see ~12/~20
    # ops (state2 masks/clamp, self/adv gates, 3-way lse, gamma).
    cross_el = P8 * P8 * 2 * Bk
    row_el = LP * 2 * Bk
    vpu_fwd = Tp * (5.0 * cross_el + 12.0 * row_el)
    vpu_bwd = Tp * (7.0 * cross_el + 20.0 * row_el)

    return [
        # XLA-side prep: two xu/label transposes, Wall gather + scatter-back
        Phase("fdt_prep", 2 * btd + 2 * xu + 2 * lab
              + 4 * n_lambda * _F32 + 2 * wall, 0.0),
        Phase("fdt_forward", xu + lab + wall + alphas, form, vpu_fwd),
        Phase("fdt_backward_grad", xu + lab + alphas + 2 * wall,
              form + contract, vpu_bwd),
        Phase("optimizer", 8 * n_lambda * _F32, 4.0 * n_lambda),
    ]


def fdt_decode_phases(B: int, T: int, L: int, D: int,
                      ns: int) -> list[Phase]:
    """Traffic/FLOP model of the fused frame-dependent-transition decode
    (kernels/fdt_pallas.py fdt_viterbi_pallas): in-kernel plane formation
    (same Wall matmul as training), int32 backpointer emission, and the
    one-hot gather traceback kernel.  The serial per-frame dependency
    chain is NOT in this model — bench.py's measured decode_floor
    (T-sweep) is the companion latency bound."""
    P = L // ns
    P8 = _up(P, _SUBLANE)
    LP = ns * P8
    R = 3 * LP + P8 * P8
    Du8 = _up(D + 2, _SUBLANE)
    Bk = _up(B, 64)
    Tp = _up(T, _TBLOCK)
    btd = B * T * D * _F32
    xu = Tp * Du8 * Bk * _F32
    wall = R * Du8 * _F32
    bp = Tp * LP * _up(Bk, _LANE) * 4          # int32 backpointers
    path = Tp * _SUBLANE * Bk * 4
    form = 2.0 * R * Du8 * Bk * Tp
    return [
        Phase("fdt_prep", btd + xu + wall, 0.0),
        Phase("fdt_viterbi_forward", xu + wall + bp, form),
        Phase("fdt_traceback", bp + path, 0.0),
    ]


def fdt_tile_floor(B: int, T: int, L: int, D: int, ns: int,
                   mode: str = "bf16x3", vpu_geps: float | None = None,
                   spec: ChipSpec = V5E) -> dict:
    """MXU-pass-exact floor for the fused fdt train step (VERDICT r3 next
    #1, 'defended floor' clause).  The idealized byte/FLOP SOL is
    unachievable here for a PHYSICAL reason measured in r4
    (runs/profile_fdt.py): the MXU consumes operands in 128-wide K/N
    tiles, and the flagship's contraction width K = D+bias = 145->152
    pads to 256 (1.68x waste) while the dW contraction's output width
    N = 152 pads likewise.  This model counts the EXACT tile passes the
    tripled-K bf16x3 kernels issue:

      formation (x2: fwd + bwd): ceil(R/128) x ceil(3*Du8/128) x
        ceil(TBK/128) passes per block,
      dW contraction: ceil(R/128) x (3*(TB+1)*Bk/128) x ceil(Du8/128),

    at 128^3 MAC per pass and the chip's bf16 MAC rate, plus the measured
    VPU element-op term (serial with the MXU — overlap measured at <10%).
    A step within ~1.2x of this floor is at the practical speed of light
    for this shape; the remaining levers (lower precision, bf16 planes)
    trade the parity bar away."""
    P = L // ns
    P8 = _up(P, _SUBLANE)
    LP = ns * P8
    R = 3 * LP + P8 * P8
    Du8 = _up(D + 2, _SUBLANE)
    Bk = _up(B, 64)
    Tp = _up(T, _TBLOCK)
    TBf, TBb = 8, 4
    mt = -(-R // _LANE)
    nt_form_f = -(-(TBf * Bk) // _LANE)
    nt_form_b = -(-(TBb * Bk) // _LANE)
    kmul = {"bf16x3": 3, "bf16": 1, "fp32": 6}[mode]
    kt_form = -(-(kmul * Du8) // _LANE)
    # dW contraction: main K = kmul*TB*Bk (exact tiles), extra kmul*Bk
    kt_con = kmul * (TBb + 1) * Bk // _LANE
    nt_con = -(-Du8 // _LANE)
    passes = (Tp // TBf) * mt * kt_form * nt_form_f \
        + (Tp // TBb) * mt * kt_form * nt_form_b \
        + (Tp // TBb) * mt * kt_con * nt_con
    mac_s = spec.bf16_tflops * 1e12 / 2.0
    mxu_s = passes * (_LANE ** 3) / mac_s
    # VPU element-ops from the fdt phase model (serial with MXU)
    vpu_el = sum(p.vpu_elems for p in fdt_train_phases(B, T, L, D, ns))
    vpu_s = vpu_el / ((vpu_geps or 3000.0) * 1e9)
    return {"mxu_passes": passes, "mxu_ms": round(mxu_s * 1e3, 3),
            "vpu_ms": round(vpu_s * 1e3, 3),
            "floor_ms": round((mxu_s + vpu_s) * 1e3, 3)}


def scrf_train_phases(B: int, T: int, L: int, D: int,
                      Dmax: int) -> list[Phase]:
    """Traffic/FLOP/VPU model of one streaming SCRF train step
    (kernels/segmental_pallas.py fwd + bwd + grad kernels; VERDICT r3
    missing #4).  Counts follow the kernel bodies: each is a grid-(T,)
    scan streaming one (Bp, Lp) row per step with a rolling (Dmax, Bp, Lp)
    VMEM window; the duration message is one (Dmax*Bp, Lp) @ (Lp, Lp) MXU
    product per frame (two in the grad kernel, which also contracts the
    transition gradient in-kernel).  The serial per-frame dependency chain
    is NOT modeled — the measured scrf decode_floor is the latency
    companion (bench.py)."""
    Bp, Lp = _up(B, _SUBLANE), _up(L, _LANE)
    row = Bp * Lp * _F32                 # one streamed (B, L) frame row
    win = Dmax * Bp * Lp                 # rolling-window element count
    btd = B * T * D * _F32
    tbl = T * B * L * _F32
    mm = 2.0 * Dmax * Bp * Lp * Lp       # one duration-message MXU product

    return [
        # frame scores (feats @ W), cumulative-score prefix sum (read +
        # write), transpose to time-major
        Phase("scrf_prep", btd + 4 * tbl, 2.0 * B * T * D * L),
        # alpha kernel: cum row in, alphas row out; per frame one MXU
        # message product + ~12 elementwise passes over the window
        Phase("scrf_forward", T * 2 * row, T * mm, T * 12.0 * win),
        Phase("scrf_backward", T * 2 * row, T * mm, T * 13.0 * win),
        # grad kernel: cum+alpha+beta rows in, A+S rows out; per frame the
        # message product AND the U^T V transition contraction; ~16 passes
        Phase("scrf_grad", T * 5 * row, T * 2 * mm, T * 16.0 * win),
        # XLA-side gradient finish (A/S recombination into dcum, feature
        # backward dW = feats^T @ dframe)
        Phase("scrf_grad_finish", 4 * tbl + btd, 2.0 * B * T * D * L),
    ]


def scrf_decode_phases(B: int, T: int, L: int, D: int,
                       Dmax: int) -> list[Phase]:
    """Streaming segmental Viterbi (segmental_viterbi_pallas + the
    deferred-resolution traceback kernel).  The forward is VPU max-plus
    (no MXU): ~6 passes over the (Dmax, Bp, Lp) window plus the
    (Bp, L, Lp) predecessor max-plus per frame; the traceback streams
    delta/argd rows back."""
    Bp, Lp = _up(B, _SUBLANE), _up(L, _LANE)
    row = Bp * Lp * _F32
    win = Dmax * Bp * Lp
    btd = B * T * D * _F32
    tbl = T * B * L * _F32
    pred = Bp * L * Lp                   # dl x trans max-plus
    return [
        Phase("scrf_prep", btd + 4 * tbl, 2.0 * B * T * D * L),
        Phase("scrf_viterbi_forward", T * 3 * row, 0.0,
              T * (6.0 * win + 3.0 * pred)),
        Phase("scrf_traceback", T * 3 * row, 0.0, T * 6.0 * Bp * Lp),
    ]


def decode_phases(B: int, T: int, L: int, D: int,
                  num_states: int = 1) -> list[Phase]:
    """Traffic model of one exact Viterbi decode step: feature map ->
    topology-factored max-plus kernel (kernels/viterbi_pallas.py, deltas
    written per frame) -> host-side delta traceback re-read."""
    Tp, Bp, Lp = _up(T, _TBLOCK), _up(B, _SUBLANE), _up(L, _LANE)
    tbl = T * B * L * _F32
    tblp = Tp * Bp * Lp * _F32
    btd = B * T * D * _F32
    P = L // max(num_states, 1)
    Pp = _up(P, _LANE)
    return [
        Phase("featuremap", btd + tbl + tbl + tblp, 2.0 * B * T * D * L),
        # forward max-plus: state in, per-frame delta scores + argmax out.
        Phase("viterbi_forward", tblp + 2 * tblp,
              2.0 * Tp * Bp * Pp * Pp * max(num_states, 1)),
        # traceback: one delta plane re-read, path out (int32 (T, B)).
        Phase("viterbi_traceback", tblp + Tp * Bp * _F32, 2.0 * T * B * L),
    ]


def summarize(phases: list[Phase], measured_s: float,
              spec: ChipSpec = V5E,
              measured_bw_gbps: float | None = None,
              mode: str = "fp32",
              vpu_geps: float | None = None) -> dict:
    """Roll phases up into the bench.py roofline record.  ``mode`` selects
    the MXU peak the FLOPs are held to ("fp32" | "bf16x3" | "bf16");
    ``vpu_geps`` (measured, measure_vpu_geps) activates the VPU term."""
    total_bytes = sum(p.bytes for p in phases)
    total_flops = sum(p.flops for p in phases)
    sol = sum(p.sol_s(spec, mode=mode, vpu_geps=vpu_geps) for p in phases)
    out = {
        "chip": spec.name,
        "hbm_gbps_peak": spec.hbm_gbps,
        "gbytes_streamed": round(total_bytes / 1e9, 4),
        "gflops": round(total_flops / 1e9, 2),
        "sol_ms": round(sol * 1e3, 3),
        "measured_ms": round(measured_s * 1e3, 3),
        "pct_of_sol": round(100.0 * sol / measured_s, 1),
        "achieved_gbps": round(total_bytes / measured_s / 1e9, 1),
        "phases": {p.name: {"mb": round(p.bytes / 1e6, 1),
                            "gflop": round(p.flops / 1e9, 2),
                            "vpu_gelems": round(p.vpu_elems / 1e9, 2),
                            "sol_ms": round(
                                p.sol_s(spec, mode=mode,
                                        vpu_geps=vpu_geps) * 1e3, 3)}
                   for p in phases},
    }
    if vpu_geps:
        out["vpu_geps_measured"] = round(vpu_geps, 1)
    if measured_bw_gbps:
        sol_ach = sum(p.sol_s(spec, bw_gbps=measured_bw_gbps, mode=mode,
                              vpu_geps=vpu_geps)
                      for p in phases)
        out["hbm_gbps_achievable"] = round(measured_bw_gbps, 1)
        out["pct_of_achievable_sol"] = round(100.0 * sol_ach / measured_s, 1)
    return out


def measure_vpu_geps(n_mb: int = 64, depth: int = 24,
                     iters: int = 12) -> float | None:
    """Measured elementwise VPU throughput in giga-element-ops/s: a fused
    chain of ``depth`` dependent exp/multiply-add stages per element (XLA
    fuses the chain into one pass, so HBM traffic amortizes to ~nothing and
    the timing is compute-bound).  exp is the dominant transcendental of
    the DP kernels, so this is the representative per-element cost; each
    chain stage counts as ~2 element-ops (one exp + one fma)."""
    import jax
    import jax.numpy as jnp

    n = n_mb * 1024 * 1024 // _F32
    x = jnp.full((n,), 0.1, jnp.float32)

    @jax.jit
    def f(x):
        z = x
        for _ in range(depth):
            z = jnp.exp(z * -0.5) * 0.9 + 0.05   # stays in a stable range
        return z

    x = f(x)
    float(x[0])
    lo_iters = max(iters // 4, 1)

    def run(k):
        nonlocal x
        t0 = time.perf_counter()
        for _ in range(k):
            x = f(x)
        float(x[0])
        return time.perf_counter() - t0

    lo = min(run(lo_iters) for _ in range(2))
    hi = min(run(iters) for _ in range(2))
    dt = hi - lo
    if dt <= 0:
        return None
    return 2.0 * depth * n * (iters - lo_iters) / dt / 1e9


def measure_stream_bw(n_mb: int = 256, iters: int = 48,
                      spec: ChipSpec = V5E) -> float | None:
    """Empirical streaming bandwidth (GB/s) on the default device: a jitted
    out-of-place saxpy (read N + write N bytes per call), chained so each
    call depends on the last, ended with a host scalar fetch (the reliable
    completion barrier in this environment — see bench.py timing note).

    The host fetch costs a constant ~tens of ms over the remote-TPU tunnel,
    which at saxpy speeds would swamp the measurement; timing two different
    iteration counts and differencing cancels that constant.

    Returns ``None`` when timing noise swamps the differencing (callers
    fall back to the peak-BW denominator); otherwise the result is clamped
    to ``spec.hbm_gbps`` — pass the ChipSpec of the device under test."""
    import jax
    import jax.numpy as jnp

    n = n_mb * 1024 * 1024 // _F32
    x = jnp.ones((n,), jnp.float32)

    @jax.jit
    def f(x):
        return x * 1.0000001 + 1e-9

    x = f(x)
    float(x[0])                      # warm + sync

    def run(k):
        nonlocal x
        t0 = time.perf_counter()
        for _ in range(k):
            x = f(x)
        float(x[0])
        return time.perf_counter() - t0

    lo = min(run(iters // 4) for _ in range(2))
    hi = min(run(iters) for _ in range(2))
    dt = hi - lo
    if dt <= 0:  # timing noise swamped the differencing: retry once
        lo = min(run(iters // 4) for _ in range(3))
        hi = min(run(iters) for _ in range(3))
        dt = hi - lo
    if dt <= 0:
        return None  # caller falls back to the peak-BW denominator
    bw = 2.0 * n * _F32 * (iters - iters // 4) / dt / 1e9
    # a not-meaningfully-positive dt can also report an absurd bandwidth;
    # anything above chip peak is noise, not measurement
    return min(bw, spec.hbm_gbps)
