"""Repro: flaky segfault in f64 SIFT extraction on XLA:CPU.

Round-4 VERDICT flagged `tests/test_features.py` aborting with
`Fatal Python error: Segmentation fault` in 3/3 per-file runs.  Round-5
isolation (this script) found the trigger is **float64 image data**
driving the SIFT kernel surface (convs/gathers/scatters) on the CPU
backend of this jaxlib build:

  mode                              crash rate (observed)
  ----------------------------      ---------------------
  f64 image, x64 on                 ~25-30 % of extracts (9/31 runs)
  f32 image, x64 on                 0/10
  f64->nothing, x64 off             0/4
  pure-jax compile hammer, x64 on   0/4  (not repo-code-specific ops)
  bare f64 eager gather loop        0/5

Crash sites vary per run (eager-gather dispatch, XLA compile,
MLIR context creation) — the delayed-corruption signature of an
out-of-bounds write in an earlier f64 CPU kernel inside jaxlib.  Fix in
the repo: `features/sift.py::extract_sift` casts f64 input to f32 (the
reference pipeline is float32 throughout, so this is also parity).

Usage: python tools/repro_sift_segv.py [f64|f32] [n_extracts]
Exit 0 = no crash this run; a segfault kills the process.
"""
import sys

import faulthandler

faulthandler.enable()
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from privacy_preserving_sfm_tpu.features import sift

dt = np.float32 if (len(sys.argv) > 1 and sys.argv[1] == "f32") else np.float64
n = int(sys.argv[2]) if len(sys.argv) > 2 else 1
rng = np.random.default_rng(0)
img = rng.standard_normal((200, 240)).astype(dt)
opts = sift.SiftOptions(max_num_features=512, candidates_per_octave=256,
                        num_octaves=3)
# NOTE: with the round-5 fix in place extract_sift itself casts f64->f32,
# so to re-trigger the underlying jaxlib bug, temporarily revert the cast
# at the top of extract_sift.
for i in range(n):
    feats = sift.extract_sift(jnp.asarray(img + dt(0.001) * i), opts)
    print("extract", i, "valid:", int(np.asarray(feats.valid).sum()),
          flush=True)
print("OK (no crash this run)")
