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
           "scrf_train_phases", "scrf_decode_phases", "scrf_tile_floor",
           "summarize", "measure_stream_bw", "measure_vpu_geps"]

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


# Exact per-frame VPU pass inventories of the r5 transposed static-slot
# segmental kernels (kernels/segmental_pallas.py) over the (Dmax, Ls, Bk)
# window, counted off the kernel bodies.  "win" passes touch the whole
# window; "small" passes touch one (Ls, Bk) plane; "pred" is the Viterbi
# predecessor max-plus over (Ls, Ls, Bk).
_SCRF_PASSES = {
    # kernel:       (win passes, small passes, MXU passes/frame)
    # (+2 small everywhere: the r5 in-kernel running cumsum — add+store)
    "fwd":  (8.0, 10.0, 1),   # seg 3, cand 1, max 1, sub+exp 2, sum 1
    "bwd":  (8.0, 10.0, 1),   # seg 3, w 1, max 1, sub+exp 2, sum 1
    "grad": (20.0, 14.0, 2),  # seg 3, x_v 1, xi 4, y 1, A 1, S 2,
                              # gd 3, F 5; retire + q_t small
    "vit":  (9.0, 8.0, 0),    # seg 3, cand 1, max 1, argd 3, valid 1
    "tb":   (0.0, 8.0, 1),    # per-frame (Ls, Bk) carries + one-hot dot
}
_SCRF_VIT_PRED_PASSES = 2.0   # cand_p add + max over (Ls, Ls, Bk)


def _scrf_dims(B: int, L: int, Dmax: int):
    Ls, Bk = _up(L, _SUBLANE), _up(B, _LANE)
    return Ls, Bk, Dmax * Ls * Bk, Ls * Bk


def scrf_train_phases(B: int, T: int, L: int, D: int,
                      Dmax: int) -> list[Phase]:
    """Traffic/FLOP/VPU model of one streaming SCRF train step
    (kernels/segmental_pallas.py fwd + bwd + grad kernels).  r5 kernels:
    TRANSPOSED (Ls=sublane-exact labels, Bk=lane batch) static-slot
    windows, factored per-frame (L, L) @ (L, B) MXU message products
    (the r4 (Dmax*B, L) dots were Dmax-fold redundant).  VPU pass counts
    are the exact kernel-body inventories (_SCRF_PASSES).  The serial
    per-frame dependency chain is NOT modeled — the measured scrf
    decode_floor is the latency companion (bench.py)."""
    Ls, Bk, win, small = _scrf_dims(B, L, Dmax)
    row = Ls * Bk * _F32                 # one streamed (L, B) frame row
    btd = B * T * D * _F32
    tbl = T * B * L * _F32
    mm = 2.0 * Ls * Ls * Bk              # one factored MXU product

    def vpu(name):
        w, s, _ = _SCRF_PASSES[name]
        return T * (w * win + s * small)

    return [
        # frame scores (feats @ W) + transpose to (T, L, B); cumulative
        # scores accumulate IN-KERNEL (r5 — no XLA log-depth cumsum)
        Phase("scrf_prep", btd + 2 * tbl, 2.0 * B * T * D * L),
        # alpha kernel: frame row in, alphas row out; per frame one
        # factored MXU message product + the exact window pass inventory
        Phase("scrf_forward", T * 2 * row, T * mm, vpu("fwd")),
        Phase("scrf_backward", T * 2 * row, T * mm, vpu("bwd")),
        # grad kernel: cum+alpha+beta rows in, A+S rows out; q_t product
        # + the K=B slot-retirement contraction
        Phase("scrf_grad", T * 5 * row, T * 2 * mm, vpu("grad")),
        # scatter-free gold numerator, value+grad (r5): label one-hots +
        # run-length scans + two batched one-hot einsums; adjoints are
        # matmuls/elementwise (the streamed scorer's scatter backward
        # measured 1.7 ms — the largest piece of the r4-era step)
        Phase("scrf_numerator", 4 * tbl,
              2.0 * 2 * B * T * L * (L + Dmax), 12.0 * B * T * L),
        # XLA-side gradient finish (A/S recombination into dcum via two
        # reverse cumsums, feature backward dW = feats^T @ dframe)
        Phase("scrf_grad_finish", 4 * tbl + btd, 2.0 * B * T * D * L,
              8.0 * B * T * L),
    ]


def scrf_decode_phases(B: int, T: int, L: int, D: int,
                       Dmax: int) -> list[Phase]:
    """Streaming segmental Viterbi (segmental_viterbi_pallas + the
    TB-blocked deferred-resolution traceback kernel), r5 transposed
    static-slot form: exact window pass inventory plus the slab-broadcast
    predecessor max-plus over (Ls, Ls, Bk) — no per-frame relayout."""
    Ls, Bk, win, small = _scrf_dims(B, L, Dmax)
    row = Ls * Bk * _F32
    btd = B * T * D * _F32
    tbl = T * B * L * _F32
    pred = Ls * Ls * Bk
    w_v, s_v, _ = _SCRF_PASSES["vit"]
    w_t, s_t, _ = _SCRF_PASSES["tb"]
    return [
        Phase("scrf_prep", btd + 2 * tbl, 2.0 * B * T * D * L),
        Phase("scrf_viterbi_forward", T * 3 * row, 0.0,
              T * (w_v * win + s_v * small
                   + _SCRF_VIT_PRED_PASSES * pred)),
        Phase("scrf_traceback", T * 3 * row, 2.0 * T * Ls * Ls * Bk,
              T * s_t * small),
    ]


def scrf_tile_floor(B: int, T: int, L: int, Dmax: int,
                    vpu_geps: float | None = None,
                    spec: ChipSpec = V5E) -> dict:
    """Defended floor for the streaming SCRF kernels (VERDICT r4 next #1
    — the scrf mirror of :func:`fdt_tile_floor`).  These kernels are
    VPU-bound: the floor is the EXACT per-frame element-pass inventory
    of the r5 kernel bodies (_SCRF_PASSES — every pass is an elementwise
    op the recursion's data dependencies require at this blocking) held
    to the MEASURED elementwise throughput, plus the per-frame MXU
    passes at the f32 pass rate (serial with the VPU — Mosaic overlap
    measured <10%, r4).  A step within ~1.2x of this floor is at the
    practical speed of light for this shape; the remaining levers
    (fewer passes via fused ops, smaller windows) change the inventory
    itself."""
    Ls, Bk, win, small = _scrf_dims(B, L, Dmax)
    geps = (vpu_geps or 3000.0) * 1e9
    mac_s = spec.fp32_tflops * 1e12 / 2.0
    pass_s = (_LANE ** 3) / mac_s

    def kern(name, extra_elems=0.0):
        w, s, mx = _SCRF_PASSES[name]
        vpu_el = T * (w * win + s * small + extra_elems)
        return vpu_el / geps + T * mx * pass_s, vpu_el

    out, parts = {}, {}
    tr = 0.0
    for name in ("fwd", "bwd", "grad"):
        t, el = kern(name)
        parts[name] = round(t * 1e3, 3)
        tr += t
    t_vit, _ = kern("vit", extra_elems=_SCRF_VIT_PRED_PASSES
                    * Ls * Ls * Bk)
    t_tb, _ = kern("tb")
    parts["vit"] = round(t_vit * 1e3, 3)
    parts["tb"] = round(t_tb * 1e3, 3)
    out["train_floor_ms"] = round(tr * 1e3, 3)
    out["decode_floor_ms"] = round((t_vit + t_tb) * 1e3, 3)
    out["kernels_ms"] = parts
    out["vpu_geps_used"] = round((vpu_geps or 3000.0), 1)
    return out


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


def measure_vpu_geps_pallas(Dmax: int = 16, Ls: int = 48, Bk: int = 128,
                            passes: int = 16, frames: int = 32,
                            grid_n: int = 256, reps: int = 5
                            ) -> float | None:
    """In-kernel elementwise throughput (giga-element-ops/s), measured by
    a Pallas microkernel that mimics the SCRF window loop: ``frames``
    sequential unrolled steps, each doing ``passes`` dependent
    elementwise ops (1 exp per 8, like the kernel bodies) over a
    VMEM-resident (Dmax, Ls, Bk) window.  This is the honest denominator
    for the scrf tile floor: the XLA-fused chain of measure_vpu_geps was
    observed to swing >2x between runs (clock/measurement instability
    over the tunnel), while the regime that matters — Mosaic-compiled,
    VMEM-resident, serial-dependent — is exactly this.  min over
    ``reps`` slope measurements."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if jax.devices()[0].platform == "cpu":
        return None

    def kernel(x_ref, o_ref, buf):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            buf[:] = jnp.broadcast_to(x_ref[:], buf.shape)

        for f in range(frames):
            z = buf[:]
            for p in range(passes):
                if p % 8 == 7:
                    z = jnp.exp(z * -0.5)
                else:
                    z = z * 0.999 + 1e-4
            buf[:] = z
        o_ref[:] = buf[0]

    def run_k(x):
        # grid repeats the small unrolled body sequentially (code size
        # stays frames*passes ops; total work scales with grid_n)
        [o] = pl.pallas_call(
            kernel,
            grid=(grid_n,),
            in_specs=[pl.BlockSpec((Ls, Bk), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((Ls, Bk), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((Ls, Bk), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((Dmax, Ls, Bk), jnp.float32)],
        )(x)
        return o

    import functools as _ft
    # k kernel launches FUSED in one jit: separate dispatches carry a
    # per-call RPC gap over the tunnel that slope timing cannot cancel
    lo_n, hi_n = 2, 6
    f_lo = jax.jit(lambda x: _ft.reduce(lambda z, _: run_k(z),
                                        range(lo_n), x))
    f_hi = jax.jit(lambda x: _ft.reduce(lambda z, _: run_k(z),
                                        range(hi_n), x))
    x = jnp.full((Ls, Bk), 0.1, jnp.float32)
    x = f_lo(x)
    float(x[0, 0])
    x = f_hi(x)
    float(x[0, 0])
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        x = f_lo(x)
        float(x[0, 0])
        lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        x = f_hi(x)
        float(x[0, 0])
        hi = time.perf_counter() - t0
        dt = (hi - lo) / (hi_n - lo_n)
        if dt > 0:
            vals.append(grid_n * frames * passes * Dmax * Ls * Bk
                        / dt / 1e9)
    if not vals:
        return None
    vals.sort()
    return vals[len(vals) // 2]          # median: robust to drift spikes


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
