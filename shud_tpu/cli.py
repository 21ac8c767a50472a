"""Command-line entry: ``python -m shud_tpu [options] <project>``.

Mirrors the reference CLI (``src/classes/CommandIn.cpp:188-278``):
``./shud <prj>`` reads ``input/<prj>/<prj>.*`` and writes
``output/<prj>.out/``.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="shud_tpu",
        description="TPU-native SHUD-class watershed hydrology model",
    )
    p.add_argument("project", nargs="?", default=None,
                   help="project name (input/<prj>/<prj>.*)")
    p.add_argument("-0", "--dummy", action="store_true", dest="dummy",
                   help="dummy run: IO pipeline only, no solving")
    p.add_argument("-g", "--split", action="store_true",
                   help="operator-split (sequential sub-system) mode")
    p.add_argument("-c", "--calib", default=None,
                   help="calibration file (.cfg.calib)")
    p.add_argument("-o", "--output", default=None, help="output folder")
    p.add_argument("-b", "--base", default=".", help="base directory")
    p.add_argument("-e", "--end-day", type=float, default=None,
                   help="override END day")
    p.add_argument("-p", "--project-file", default=None, metavar="SHUD",
                   help="load paths from a <prj>.SHUD project manifest "
                        "(FileIn::readProject)")
    p.add_argument("-v", "--verbose", action="store_true",
                   help="verbose screen output (overrides -q)")
    p.add_argument("-f", "--fflush", action="store_true",
                   help="flush every output record to disk as written")
    p.add_argument("-n", "--num-workers", type=int, default=None,
                   metavar="N",
                   help="reference -n (OpenMP threads / CMA-ES lambda); "
                        "accepted for CLI parity — XLA manages device "
                        "parallelism, use --shards for multi-chip")
    p.add_argument("-q", "--quiet", action="store_true")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend")
    p.add_argument("--per-window", action="store_true",
                   help="use the per-window driver instead of the fused "
                        "lax.scan driver")
    p.add_argument("--f32", action="store_true",
                   help="reduced-precision fast path (TPU)")
    p.add_argument("--pallas", dest="pallas", action="store_true",
                   default=None,
                   help="force the fused Pallas edge kernel (f32 only)")
    p.add_argument("--no-pallas", dest="pallas", action="store_false",
                   help="disable the fused Pallas edge kernel")
    p.add_argument("--mega", dest="mega", action="store_true", default=None,
                   help="force the whole-RHS Pallas megakernel solve path "
                        "(f32, lake-free VMEM-resident meshes)")
    p.add_argument("--no-mega", dest="mega", action="store_false",
                   help="disable the whole-RHS Pallas megakernel")
    p.add_argument("--resume", default=None, metavar="CKPT",
                   help="resume from a full binary checkpoint (.ckpt.npz)")
    p.add_argument("--shards", type=int, default=None, metavar="P",
                   help="run domain-decomposed over P devices "
                        "(shard_map; use XLA_FLAGS="
                        "--xla_force_host_platform_device_count=P --cpu "
                        "to simulate a pod slice on CPU)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler trace to DIR")
    p.add_argument("--distributed", nargs="?", const="", default=None,
                   metavar="COORD:PORT,NPROC,RANK",
                   help="multi-host pod-slice run: initialise "
                        "jax.distributed before anything else (bare flag "
                        "= Cloud TPU autodetect; combine with --shards "
                        "<global device count>)")
    args = p.parse_args(argv)

    if args.distributed is not None:
        from shud_tpu.parallel.runtime import init_distributed

        if args.distributed:
            coord, nproc, rank = args.distributed.rsplit(",", 2)
            rank_i, n = init_distributed(coord, int(nproc), int(rank))
        else:
            rank_i, n = init_distributed()
        if not args.quiet:
            print(f"jax.distributed: process {rank_i}, "
                  f"{n} global devices")

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.quiet and args.verbose:
        args.quiet = False
    if args.fflush:
        from shud_tpu.io import output as _out

        _out.FFLUSH_MODE = True

    inp = None
    if args.project_file:
        from shud_tpu.io.project import load_project, read_project_file

        paths = read_project_file(args.project_file)
        inp = load_project(paths.project, paths=paths)
        args.project = paths.project
        if args.output is None:
            args.output = paths.outpath
    elif args.project is None:
        p.error("a project name (or -p <file>.SHUD) is required")

    calib = None
    if args.calib:
        from shud_tpu.io.project import read_calib

        calib = read_calib(args.calib)

    if inp is not None and (args.shards is not None or args.split
                            or args.per_window or args.dummy):
        p.error("-p is supported with the default (fused) driver only")

    if args.shards is not None:
        from shud_tpu.parallel.runtime import run_project_sharded

        run_project_sharded(args.project, base=args.base, p=args.shards,
                            end_day=args.end_day, verbose=not args.quiet,
                            outpath=args.output)
        return

    if args.split:
        from shud_tpu.driver.uncoupled import run_project_split

        run_project_split(args.project, base=args.base,
                          end_day=args.end_day, verbose=not args.quiet,
                          outpath=args.output, calib=calib)
    elif args.per_window or args.dummy:
        from shud_tpu.driver.run import run_project

        run_project(
            args.project,
            base=args.base,
            end_day=args.end_day,
            verbose=not args.quiet,
            dummy=args.dummy,
            outpath=args.output,
            calib=calib,
        )
    else:
        import contextlib

        import jax
        import jax.numpy as jnp

        from shud_tpu.driver.run_fast import run_project_fast
        from shud_tpu.utils.errors import ShudError

        prof = (jax.profiler.trace(args.profile) if args.profile
                else contextlib.nullcontext())
        try:
            with prof:
                run_project_fast(
                    args.project,
                    base=args.base,
                    end_day=args.end_day,
                    verbose=not args.quiet,
                    float_dtype=jnp.float32 if args.f32 else jnp.float64,
                    outpath=args.output,
                    calib=calib,
                    resume=args.resume,
                    inp=inp,
                    pallas_edges="auto" if args.pallas is None else args.pallas,
                    mega="auto" if args.mega is None else args.mega,
                )
        except ShudError as e:  # reference myexit: typed exit codes
            print(f"FATAL: {e}", flush=True)
            raise SystemExit(e.code)


if __name__ == "__main__":
    main()
