"""CLI: ``python -m frontistr_tpu [workdir]`` — the fistr1 binary equivalent
(fistr1/src/main/main.c:77-103; flags -h/-v/-c)."""

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="frontistr_tpu",
                                description="TPU-native FrontISTR-compatible "
                                            "FEM solver")
    p.add_argument("workdir", nargs="?", default=".",
                   help="directory containing hecmw_ctrl.dat")
    p.add_argument("-v", "--version", action="store_true")
    args = p.parse_args(argv)
    if args.version:
        from frontistr_tpu import __version__
        print(f"frontistr_tpu {__version__}")
        return 0
    from frontistr_tpu.run import run_directory
    out = run_directory(args.workdir)
    print(f"### frontistr_tpu completed ({out['total_time']:.2f} s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
