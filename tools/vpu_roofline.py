"""Measure the VPU f32 elementwise issue rate on this chip - the roofline
denominator for the megakernel's pair-test cost (ROADMAP.md round-3
speed-of-light argument).

A Pallas kernel runs N chained vector steps on eight INDEPENDENT (32, 128)
f32 accumulators (independence keeps the measurement at the issue rate,
not the op latency). Each step is a multiply + a max per accumulator -
two ops counted separately, matching how the ROADMAP counts pair-test
ops. max keeps the chain non-affine so no compiler can collapse the loop
into a closed form (a pure a*m+c chain measured as "2379 TFLOPS" - the
whole loop constant-folded).

Usage: python tools/vpu_roofline.py  ->  one JSON line {"vpu_tflops": ...}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_STEPS = 16384
N_ACC = 8
GRID = 256
SHAPE = (32, 128)


def _kernel(o_ref):
    base = lax.broadcasted_iota(jnp.int32, SHAPE, 1).astype(jnp.float32)
    accs = [base * (0.001 * (k + 1)) + 1.0 for k in range(N_ACC)]
    # values stay in [c, ~1.3]: mul by just-under-1, clamp from below
    m = np.float32(0.9999)
    c = np.float32(0.125)

    def body(i, accs):
        return tuple(jnp.maximum(a * m, c) for a in accs)

    accs = lax.fori_loop(0, N_STEPS, body, tuple(accs))
    out = accs[0]
    for a in accs[1:]:
        out = out + a
    o_ref[...] = out


def measure() -> dict:
    out = pl.pallas_call(
        _kernel,
        grid=(GRID,),
        out_specs=pl.BlockSpec(SHAPE, lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GRID * SHAPE[0], SHAPE[1]),
                                       jnp.float32),
    )
    # int() pull forces real completion (block_until_ready alone does not
    # reliably sync through the axon tunnel). The tunnel RTT (~30 ms) is
    # comparable to one kernel's compute, so measure k pipelined
    # dispatches minus 1 dispatch: the difference is pure device compute.
    def timed(k):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = jnp.float32(0.0)
            for _ in range(k):
                acc = acc + jnp.sum(out()[0])
            int(acc)
            best = min(best, time.perf_counter() - t0)
        return best

    int(jnp.sum(out()[0]))  # compile + warm
    t1 = timed(1)
    t10 = timed(10)
    per_call = max((t10 - t1) / 9.0, 1e-9)
    el_ops = GRID * N_STEPS * N_ACC * 2 * SHAPE[0] * SHAPE[1]
    return {
        "vpu_tflops": round(el_ops / per_call / 1e12, 3),
        "wall_ms": round(per_call * 1000, 3),
        "t1_ms": round(t1 * 1000, 3),
        "el_ops": el_ops,
        "device": str(jax.devices()[0]),
    }


if __name__ == "__main__":
    print(json.dumps(measure()))
