"""Seed/config sweep launcher — the TPU-native replacement for the TACC
SLURM job farm (python/Submit_schedule_frontera/).

The reference farms independent (seed, config) runs one-per-GPU via
generated argument files + `launcher paramrun`. Independent runs need no
communication, so the TPU equivalent is simply N processes (one per host /
TPU slice over DCN) or sequential runs on one chip. This module generates
the command list (like Generating_argurment_files.py) and can execute them
locally.

Usage:
    python -m adjoint_ode_adaptivity_tpu.drivers.sweep \
        --driver train_resnet_ode --seeds 5 6 7 8 \
        --extra "--method variable_params --epochs 100" --run
"""
from __future__ import annotations

import argparse
import shlex
import subprocess
import sys


def generate_commands(driver: str, seeds: list[int], extra: str) -> list[str]:
    base = f"{sys.executable} -m adjoint_ode_adaptivity_tpu.drivers.{driver}"
    return [f"{base} --seed {s} {extra}".strip() for s in seeds]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--driver", default="train_resnet_ode")
    p.add_argument("--seeds", type=int, nargs="+", default=[5, 6, 7, 8])
    p.add_argument("--extra", default="", help="extra args passed to each run")
    p.add_argument("--out", default=None, help="write the command file here")
    p.add_argument("--run", action="store_true", help="execute sequentially")
    args = p.parse_args(argv)

    cmds = generate_commands(args.driver, args.seeds, args.extra)
    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(cmds) + "\n")
        print(f"wrote {len(cmds)} commands to {args.out}")
    else:
        for c in cmds:
            print(c)
    if args.run:
        for c in cmds:
            print(f"==> {c}")
            subprocess.run(shlex.split(c), check=True)
    return cmds


if __name__ == "__main__":
    main()
