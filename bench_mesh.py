#!/usr/bin/env python
"""Mesh-scaling probe: weak scaling + collective cost on the device mesh.

VERDICT r03 item 7: the multichip dryrun proves 8-device CORRECTNESS;
this harness records the SCALING evidence — per-chip work held constant
while the mesh grows, plus the measured cost of the one collective the
production pricer issues (a psum of (8,128) f32 moment slabs,
parallel/mesh.py:106).

On this box the mesh is VIRTUAL (``--xla_force_host_platform_device_count``
over the host CPU), so the N devices share physical cores: the weak-
scaling walls measure the SPMD program structure (partitioning, collective
insertion, fusion), not real-chip throughput — the per-psum microbench and
the slab arithmetic are the transferable numbers.  BASELINE.md "Mesh
scaling" composes them with the single-chip kernel times into the v5p-16
prediction.  Run on a real pod slice, the same script records the real
thing (the probe uses whatever backend initializes; pass --platform cpu to
force the virtual mesh).

Output: ONE JSON line; also written to MESHSCALE_r04.json by `make
mesh-probe`.
"""

import argparse
import functools
import json
import os
import subprocess
import sys
import time

PER_CHIP_PATHS = 1 << 20
N_STEPS = 1          # terminal draw: the headline workload shape
SLAB_SHAPE = (8, 128)  # the production psum payload (one moment slab)


def _child(max_devices: int, platform: str) -> dict:
    """Runs inside the provisioned process: measure and return the table."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from mc_tpu import OptionParams, SimParams
    from mc_tpu.parallel import make_mesh, price_sharded

    devices = jax.devices()
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= min(max_devices,
                                                         len(devices))]

    def best_of(fn, reps=5):
        fn()  # compile / warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    # --- weak scaling: per-chip work constant, mesh grows ------------------
    option = OptionParams()
    weak = []
    for n in sizes:
        mesh = make_mesh(devices[:n])
        sim = SimParams(n_paths=n * PER_CHIP_PATHS, n_steps=N_STEPS)
        # engine="xla" so the probe is the SPMD program, not the Pallas
        # interpreter (bitwise-identical results by the engine contract).
        run = lambda: float(price_sharded(option=option, sim=sim,
                                          mesh=mesh, engine="xla",
                                          method="terminal").price)
        wall = best_of(run)
        weak.append({"devices": n, "paths": sim.n_paths,
                     "wall_ms": round(wall * 1e3, 3)})
    t1 = weak[0]["wall_ms"]
    for row in weak:
        row["ratio_vs_1dev"] = round(row["wall_ms"] / t1, 3)

    # --- psum slab cost: the ONE collective the pricer issues --------------
    # K chained psums of an (8,128) f32 slab inside one jitted shard_map
    # program; T(K)-T(1) differential isolates the per-psum cost from
    # dispatch/fetch overhead (same methodology as bench.py).
    def psum_seconds(mesh, n, k):
        @functools.partial(jax.jit, static_argnames=("reps",))
        def prog(x, reps):
            def shard_fn(x):
                def body(i, y):
                    return jax.lax.psum(y, "paths") * jnp.float32(1.0 / n)
                return jax.lax.fori_loop(0, reps, body, x)
            return jnp.sum(jax.shard_map(
                shard_fn, mesh=mesh, in_specs=P(), out_specs=P(),
                check_vma=False)(x))

        x = jnp.full(SLAB_SHAPE, 1.0, jnp.float32)
        t_1 = best_of(lambda: float(prog(x, 1)))
        t_k = best_of(lambda: float(prog(x, k)))
        return max((t_k - t_1) / (k - 1), 1e-9)

    psum = []
    for n in sizes:
        if n == 1:
            continue  # psum over a 1-axis is a no-op XLA elides
        mesh = make_mesh(devices[:n])
        dt = psum_seconds(mesh, n, k=256)
        psum.append({"devices": n, "slab_psum_us": round(dt * 1e6, 3)})

    return {
        "backend": jax.default_backend(),
        "virtual_mesh": jax.default_backend() == "cpu",
        "per_chip_paths": PER_CHIP_PATHS,
        "slab_shape": list(SLAB_SHAPE),
        "weak_scaling": weak,
        "psum_slab": psum,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--platform", choices=("tpu", "cpu"), default="cpu",
                    help="cpu (default): self-provision a virtual mesh; "
                         "tpu: use the real backend's devices")
    args = ap.parse_args(argv)

    if os.environ.get("MC_TPU_MESHPROBE_CHILD") == "1":
        if args.platform == "cpu":
            # env var alone does not stick in this image (the container
            # registers the TPU plugin first) — pin before any device touch
            import jax
            jax.config.update("jax_platforms", "cpu")
        print(json.dumps(_child(args.devices, args.platform)))
        return 0

    env = dict(os.environ)
    if args.platform == "cpu":
        flags = env.get("XLA_FLAGS", "")
        env["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{args.devices}").strip()
        env["JAX_PLATFORMS"] = "cpu"
    env["MC_TPU_MESHPROBE_CHILD"] = "1"
    cmd = [sys.executable, os.path.abspath(__file__),
           "--devices", str(args.devices), "--platform", args.platform]
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                          cwd=os.path.dirname(os.path.abspath(__file__)))
    if proc.returncode != 0:
        print(json.dumps({"error": "mesh-probe-failed",
                          "detail": proc.stderr[-1500:]}))
        return 1
    # child prints exactly one JSON line (last line of stdout)
    print(proc.stdout.strip().splitlines()[-1])
    return 0


if __name__ == "__main__":
    sys.exit(main())
