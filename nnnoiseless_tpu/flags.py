"""Operational escape hatches — read ONCE at process start.

Each flag selects between two validated engine configurations (the default
path and a fallback that earlier rounds shipped); they exist so an operator
can pin the engine if a compiler regression lands on one path
(docs/PERFORMANCE.md "hard-won numeric lessons").

The values are captured at import time on purpose: most consumers run
inside ``jax.jit``-traced functions whose compile cache is NOT keyed on
environment variables, so a per-call ``os.environ`` read would make a
mid-process toggle *silently* ignored after the first compile.  Import-time
capture makes the contract explicit — set the variable before the process
starts (or before importing :mod:`nnnoiseless_tpu`).

Flags:

* ``NNT_PITCH_KERNEL=0`` — replace the fused pitch-analysis Pallas kernel
  (ops/pitch_kernel.py) with the round-2 XLA op chain in the precompute.
* ``NNT_FUSED=0`` — replace the fused frame-loop Pallas kernel
  (ops/frame_kernel.py) with the ``lax.scan`` body (pipeline.py).
* ``NNT_TWO_PHASE=0`` — compile precompute + frame loop as one XLA program
  instead of two chained device programs (denoise._two_phase_chunk).
* ``NNT_FPS=N`` — frames per fused-kernel grid step (default 5, measured
  fastest at production shape).
"""

from __future__ import annotations

import os

PITCH_KERNEL: bool = os.environ.get("NNT_PITCH_KERNEL", "1") != "0"
FUSED: bool = os.environ.get("NNT_FUSED", "1") != "0"
TWO_PHASE: bool = os.environ.get("NNT_TWO_PHASE", "1") != "0"
FPS: int = int(os.environ.get("NNT_FPS", "5"))
