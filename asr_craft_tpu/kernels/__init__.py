"""Pallas TPU kernels for the DP hot loops (SURVEY.md §7.1 step 6).

Kernel implementations are selected by :func:`backend`: "pallas" on TPU,
"xla" (the lax.scan MXU path) elsewhere; override with set_backend().
"""
from __future__ import annotations

import jax

_BACKEND = "auto"


def set_backend(name: str) -> None:
    """"auto" | "pallas" | "xla"."""
    global _BACKEND
    if name not in ("auto", "pallas", "xla"):
        raise ValueError(name)
    _BACKEND = name


def backend() -> str:
    if _BACKEND != "auto":
        return _BACKEND
    try:
        return "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"
    except Exception:  # pragma: no cover
        return "xla"


from asr_craft_tpu.kernels.fwdbwd_pallas import (backward_pallas,
                                                 forward_pallas)
from asr_craft_tpu.kernels.segmental_pallas import (segmental_backward_pallas,
                                                    segmental_forward_pallas,
                                                    segmental_grad_pallas,
                                                    segmental_viterbi_pallas,
                                                    segmental_viterbi_traceback_pallas)
from asr_craft_tpu.kernels.viterbi_pallas import (viterbi_pallas,
                                                  viterbi_pallas_nstate)
from asr_craft_tpu.kernels.dual_pallas import (backward_dual_grad_pallas,
                                               backward_dual_pallas,
                                               forward_dual_pallas)
from asr_craft_tpu.kernels.fdt_pallas import (fdt_backward_grad_pallas,
                                              fdt_forward_pallas,
                                              fdt_nll_dual_pallas,
                                              fdt_viterbi_pallas)
