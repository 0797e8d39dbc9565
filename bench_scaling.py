"""Multi-chip scaling harness: the sharded prover step at 1..N devices.

The BASELINE north star is NTT+hash scaling efficiency vs 1 chip on a real
pod slice. Only one physical chip is reachable here, so this harness measures
the full sharded prover step (distributed LDE with all_to_all, row-sharded
quotient, fold, grind) over a VIRTUAL CPU mesh — validating the sharding and
collective structure and reporting the efficiency curve. On a real slice the
same code path runs unchanged (mesh from jax.devices()).

Usage:  XLA_FLAGS=--xla_force_host_platform_device_count=8 python bench_scaling.py
Prints one JSON line per mesh size.
"""

from __future__ import annotations

import json
import os
import time

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np


def main() -> None:
    if os.environ.get("TAPSTARK_BENCH_CPU") == "1" or jax.default_backend() != "tpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    from jax.sharding import Mesh

    from tapstark.airs import FibonacciAir
    from tapstark.mesh.ntt import AXIS
    from tapstark.mesh.prover_step import make_sharded_prover_step

    devices = jax.devices()
    log_n = 14 if jax.default_backend() == "tpu" else 10
    sizes = [d for d in (1, 2, 4, 8) if d <= len(devices)]
    base_time = None
    for nd in sizes:
        mesh = Mesh(np.array(devices[:nd]), (AXIS,))
        step, args = make_sharded_prover_step(
            mesh, FibonacciAir(), log_n=log_n, log_blowup=1
        )
        out = step(*args)
        _ = np.asarray(out[2][0, 0])  # warm + real sync
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = step(*args)
            _ = np.asarray(out[2][0, 0])
        dt = (time.perf_counter() - t0) / reps
        if base_time is None:
            base_time = dt
        efficiency = base_time / (dt * nd)
        # Comm-volume model (see SCALING.md): the step's only material ICI
        # traffic is the two four-step all_to_all transposes (iNTT on (n, w),
        # forward NTT on (n*2^b, w)); quotient/fold are row-local (halo of
        # `next_step` rows) and grind reduces one scalar.
        n_rows = 1 << log_n
        width = 2
        log_blowup = 1
        a2a_bytes = (
            4 * width * (n_rows + (n_rows << log_blowup)) * (nd - 1) // max(nd, 1)
        )
        per_dev_comm = a2a_bytes // max(nd, 1)
        butterflies = width * (
            (n_rows // 2) * log_n
            + ((n_rows << log_blowup) // 2) * (log_n + log_blowup)
        )
        print(
            json.dumps(
                {
                    "metric": f"sharded prover step (2^{log_n} rows)",
                    "devices": nd,
                    "value": dt * 1e3,
                    "unit": "ms/step",
                    "scaling_efficiency_vs_1": round(efficiency, 3),
                    "ici_bytes_per_device": per_dev_comm,
                    "butterflies_per_device": butterflies // nd,
                    "comm_to_compute_bytes_per_butterfly": round(
                        per_dev_comm / (butterflies / nd), 4
                    ),
                    "backend": jax.default_backend(),
                }
            )
        )


if __name__ == "__main__":
    main()
