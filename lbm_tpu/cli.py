"""Command-line interface.

Usage parity with the reference (README.md:14-21, d2q9-bgk.c:133-142):

    python -m lbm_tpu <paramfile> <obstaclefile> [options]

and the same visible contract: writes ``final_state.dat`` and ``av_vels.dat``
(d2q9-bgk.c:16-17) in the output directory and prints the reference's exact
stdout block (d2q9-bgk.c:283-287):

    ==done==
    Reynolds number:\t\t%.12E
    Elapsed time:\t\t\t%.6f (s)
    Elapsed user CPU time:\t\t%.6f (s)
    Elapsed system CPU time:\t%.6f (s)

Extra (optional, off by default) flags expose the TPU-native surface:
``--backend``, ``--precision``, ``--mesh``, ``--out-dir``, checkpointing, and
profiling.
"""

from __future__ import annotations

import argparse
import os
import resource
import sys
import time



def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="lbm_tpu",
        description="TPU-native D2Q9 BGK lattice-Boltzmann solver",
    )
    p.add_argument("paramfile", help="7-field params file (nx ny maxIters reynolds_dim density accel omega)")
    p.add_argument("obstaclefile", help="obstacle list file ('x y 1' per line)")
    # The hierarchical slab kernel is a documented negative result (it loses
    # to band/band2 everywhere by its own affine model, BENCHMARKS.md): it
    # is quarantined out of the dispatch surface unless LBM_ENABLE_SLAB=1.
    backends = ["auto", "pallas", "resident", "aa", "temporal", "deep",
                "band", "band2", "band3", "reference", "pallas-overlap"]
    if os.environ.get("LBM_ENABLE_SLAB") == "1":
        backends.insert(9, "slab")
    p.add_argument(
        "--backend",
        choices=backends,
        default="auto",
        help="step implementation: block-streaming Pallas kernel, VMEM-resident "
        "multi-step kernel (grids that fit on-chip), in-place AA-resident "
        "kernel (single-copy VMEM residency up to ~1536^2 f32 / 2048^2 bf16), "
        "temporally-blocked T-steps-per-pass kernel (HBM-bound grids), deep "
        "state-view temporal kernel (T>=8, halo strips read from the input "
        "state), band kernel (fixed-buffer deep blocking, in-kernel T=16-32 "
        "step loop; with --mesh N, communication-avoiding T-steps-per-"
        "ppermute sharding), band2 (band schedule + resident ping-pong "
        "body), band3 (band schedule + in-place AA body on ONE buffer), "
        "jnp reference, auto, or pallas-overlap (sharded runs only: "
        "in-kernel RDMA halo exchange)",
    )
    p.add_argument(
        "--precision",
        choices=["f32", "f64", "bf16", "c16"],
        default="f32",
        help="state dtype: f32 (default, passes the 1%% golden gate), "
        "f64 (CPU exactness studies), c16 (companded 16-bit deviation "
        "storage — the supported 16-bit mode: bf16's bandwidth with "
        "golden-gate-passing accuracy; single-device or any mesh), "
        "bf16 (EXPERIMENTAL: raw bfloat16 state CANNOT pass the 1%% "
        "golden gate — av_vels drifts ~100%%; use c16 instead)",
    )
    p.add_argument(
        "--mesh",
        default="0",
        metavar="N|PYxPX",
        help="shard the lattice over N devices (1-D row mesh), or a 2-D "
        "PYxPX mesh like 2x4 (0 = single device)",
    )
    p.add_argument("--out-dir", default=".", help="directory for output .dat files")
    p.add_argument(
        "--device",
        type=int,
        default=None,
        metavar="N",
        help="device index (default: $LBM_DEVICE or first device; "
        "the reference's OCL_DEVICE analogue)",
    )
    p.add_argument(
        "--list-devices",
        action="store_true",
        help="print the device table and exit",
    )
    p.add_argument(
        "--debug",
        action="store_true",
        help="per-step av-velocity + total-density report (the reference's "
        "-DDEBUG mode)",
    )
    p.add_argument(
        "--check-nan",
        action="store_true",
        help="fail fast if the simulation goes non-finite",
    )
    p.add_argument(
        "--checkpoint-every",
        type=int,
        default=0,
        metavar="K",
        help="snapshot resumable state every K steps",
    )
    p.add_argument(
        "--checkpoint-path",
        default=None,
        help="checkpoint file path (default: <out-dir>/checkpoint.npz when "
        "enabled, or <out-dir>/checkpoint.orbax for --checkpoint-format orbax)",
    )
    p.add_argument(
        "--checkpoint-format",
        choices=["npz", "orbax"],
        default="npz",
        help="checkpoint container: single atomic .npz file (default) or an "
        "orbax checkpoint directory (the TPU-ecosystem standard)",
    )
    p.add_argument(
        "--resume",
        action="store_true",
        help="resume from --checkpoint-path if it exists",
    )
    p.add_argument(
        "--profile-dir",
        default=None,
        help="write a jax.profiler trace (view with TensorBoard)",
    )
    p.add_argument(
        "--multihost",
        action="store_true",
        help="initialize jax.distributed for multi-host pod slices "
        "(reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)",
    )
    p.add_argument(
        "--stats-json",
        default=None,
        metavar="PATH",
        help="write run metrics (MLUPS, timings, Reynolds, config) as JSON",
    )
    p.add_argument(
        "--verbose", "-v", action="store_true", help="log configuration and timings"
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.precision == "f64":
        import jax

        jax.config.update("jax_enable_x64", True)

    # Import after the x64 flag is set.
    import jax
    import jax.numpy as jnp

    from lbm_tpu.io import read_obstacles, read_params, write_av_vels, write_final_state
    from lbm_tpu.runtime.driver import run_simulation

    if args.multihost:
        from lbm_tpu.parallel.multihost import initialize_multihost

        initialize_multihost()

    from lbm_tpu.runtime.device import print_devices, select_device

    if args.list_devices:
        print_devices(file=sys.stdout)
        return 0

    # Clean fatal diagnostics for bad inputs (the reference's die(),
    # d2q9-bgk.c:933-939) rather than tracebacks.
    from lbm_tpu.io.files import InputError

    try:
        device = select_device(args.device)
    except (IndexError, ValueError) as e:
        print(f"lbm_tpu: error: {e}", file=sys.stderr)
        return 1

    # Startup device report — the reference always prints this block
    # (d2q9-bgk.c:975-981, 1002-1004).
    from lbm_tpu.runtime.device import format_device_list, format_selected

    print(format_device_list())
    print(format_selected(device))

    try:
        params = read_params(args.paramfile)
        obstacles = read_obstacles(args.obstaclefile, params)
    except (InputError, OSError) as e:
        print(f"lbm_tpu: error: {e}", file=sys.stderr)
        return 1
    dtype = {
        "f32": jnp.float32,
        "f64": jnp.float64,
        "bf16": jnp.bfloat16,
        "c16": "c16",  # normalized inside run_simulation (ops/devspace.py)
    }[args.precision]
    if args.precision == "bf16":
        # Demoted to experimental (VERDICT r3): raw bf16 state drifts far
        # past the checker's 1% tolerance over the official runs; c16 gives
        # the same HBM traffic with gate-passing accuracy.
        print(
            "lbm_tpu: warning: --precision bf16 is EXPERIMENTAL and cannot "
            "pass the 1% golden gate (av_vels drift ~100% over the official "
            "runs); use --precision c16 for accurate 16-bit storage",
            file=sys.stderr,
        )

    if args.verbose:
        print(
            f"[lbm_tpu] grid {params.nx}x{params.ny}, {params.max_iters} iters, "
            f"backend={args.backend}, precision={args.precision}, "
            f"device={device.device_kind} ({device.platform})",
            file=sys.stderr,
        )

    checkpoint_path = args.checkpoint_path
    if checkpoint_path is None and (args.checkpoint_every or args.resume):
        checkpoint_path = os.path.join(
            args.out_dir, f"checkpoint.{args.checkpoint_format}"
        )

    initial_cells = None
    start_step = 0
    av_prefix = None
    if args.resume and checkpoint_path and os.path.exists(checkpoint_path):
        from lbm_tpu.runtime.checkpoint import load_checkpoint_as

        initial_cells, av_prefix, start_step = load_checkpoint_as(
            checkpoint_path, params, format=args.checkpoint_format
        )
        if args.verbose:
            print(f"[lbm_tpu] resuming from step {start_step}", file=sys.stderr)
        if start_step >= params.max_iters:
            print(
                f"lbm_tpu: error: checkpoint already at step {start_step} of "
                f"{params.max_iters}; nothing to resume",
                file=sys.stderr,
            )
            return 1

    profiling = args.profile_dir is not None
    if profiling:
        jax.profiler.start_trace(args.profile_dir)

    mesh_2d = None
    mesh_n = 0
    if "x" in args.mesh:
        try:
            py, px = (int(v) for v in args.mesh.split("x"))
        except ValueError:
            print(f"lbm_tpu: error: bad --mesh {args.mesh!r}", file=sys.stderr)
            return 1
        mesh_2d = (py, px)
    else:
        try:
            mesh_n = int(args.mesh)
        except ValueError:
            print(f"lbm_tpu: error: bad --mesh {args.mesh!r}", file=sys.stderr)
            return 1

    # Unsupported flag combinations fail loudly rather than silently
    # dropping a resumed state or checkpoint schedule (ADVICE r1).
    meshed = mesh_2d is not None or mesh_n > 1
    if meshed and args.debug:
        print(
            "lbm_tpu: error: --debug (per-step report) is not supported with "
            "--mesh; run single-device",
            file=sys.stderr,
        )
        return 1
    tic = time.time()
    if mesh_2d is not None:
        from lbm_tpu.parallel.sharded import run_simulation_sharded_2d

        try:
            result = run_simulation_sharded_2d(
                params, obstacles, mesh_shape=mesh_2d, backend=args.backend,
                dtype=dtype,
                initial_cells=initial_cells,
                start_step=start_step,
                av_vels_prefix=av_prefix,
                checkpoint_every=args.checkpoint_every,
                checkpoint_path=checkpoint_path if args.checkpoint_every else None,
                checkpoint_format=args.checkpoint_format,
            )
        except ValueError as e:
            print(f"lbm_tpu: error: {e}", file=sys.stderr)
            return 1
    elif mesh_n > 1:
        from lbm_tpu.parallel.sharded import run_simulation_sharded

        try:
            result = run_simulation_sharded(
                params,
                obstacles,
                n_devices=mesh_n,
                backend=args.backend,
                dtype=dtype,
                initial_cells=initial_cells,
                start_step=start_step,
                av_vels_prefix=av_prefix,
                checkpoint_every=args.checkpoint_every,
                checkpoint_path=checkpoint_path if args.checkpoint_every else None,
                checkpoint_format=args.checkpoint_format,
            )
        except ValueError as e:
            print(f"lbm_tpu: error: {e}", file=sys.stderr)
            return 1
    else:
        on_chunk = None
        chunk_every = 0
        if args.debug:
            # The reference's -DDEBUG per-step report (d2q9-bgk.c:229-233).
            from lbm_tpu.utils.diagnostics import debug_report

            chunk_every = 1

            def on_chunk(step, cells, av_chunk):
                print(debug_report(step - 1, float(av_chunk[-1]), cells))

        try:
            result = run_simulation(
                params,
                obstacles,
                backend=args.backend,
                dtype=dtype,
                initial_cells=initial_cells,
                start_step=start_step,
                av_vels_prefix=av_prefix,
                checkpoint_every=args.checkpoint_every,
                checkpoint_path=checkpoint_path if args.checkpoint_every else None,
                checkpoint_format=args.checkpoint_format,
                chunk_every=chunk_every,
                on_chunk=on_chunk,
                device=device,
            )
        except ValueError as e:
            print(f"lbm_tpu: error: {e}", file=sys.stderr)
            return 1
    if args.check_nan:
        from lbm_tpu.utils.diagnostics import NaNError, check_finite

        try:
            check_finite(result.av_vels, result.cells, context="end of run")
        except NaNError as e:
            print(f"lbm_tpu: error: {e}", file=sys.stderr)
            return 1
    toc = time.time()

    if profiling:
        jax.profiler.stop_trace()

    ru = resource.getrusage(resource.RUSAGE_SELF)

    # The reference's exact stdout block (d2q9-bgk.c:283-287).
    print("==done==")
    print("Reynolds number:\t\t%.12E" % result.reynolds(params, obstacles))
    print("Elapsed time:\t\t\t%.6f (s)" % (toc - tic))
    print("Elapsed user CPU time:\t\t%.6f (s)" % ru.ru_utime)
    print("Elapsed system CPU time:\t%.6f (s)" % ru.ru_stime)
    if args.verbose:
        print(
            f"[lbm_tpu] compute loop {result.elapsed:.6f} s "
            f"({result.mlups(params):.1f} MLUPS), compile {result.compile_time:.3f} s",
            file=sys.stderr,
        )

    if args.stats_json:
        import json

        stats = {
            "nx": params.nx,
            "ny": params.ny,
            "max_iters": params.max_iters,
            "backend": args.backend,
            "precision": args.precision,
            "mesh": args.mesh,
            "device": f"{device.device_kind} ({device.platform})",
            "elapsed_wall_s": toc - tic,
            "loop_s": result.elapsed,
            "compile_s": result.compile_time,
            "mlups": result.mlups(params),
            "reynolds": result.reynolds(params, obstacles),
        }
        with open(args.stats_json, "w") as f:
            json.dump(stats, f, indent=2)
            f.write("\n")

    os.makedirs(args.out_dir, exist_ok=True)
    write_final_state(
        os.path.join(args.out_dir, "final_state.dat"), params, result.cells, obstacles
    )
    write_av_vels(os.path.join(args.out_dir, "av_vels.dat"), result.av_vels)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
