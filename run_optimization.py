#!/usr/bin/env python3
"""Run a structure optimization (CLI parity: ref run_optimization.py:9-21)."""

import argparse
import faulthandler
import signal

from deepsdf_tpu.opt.driver import configure_logging, struct_optimization

if __name__ == "__main__":
    # ops aid: `kill -USR1 <pid>` dumps all python thread stacks to
    # stderr without interrupting the run (long remote compiles through
    # the TPU tunnel are otherwise indistinguishable from hangs)
    faulthandler.register(signal.SIGUSR1)
    parser = argparse.ArgumentParser()
    parser.add_argument("optimization_folder", type=str,
                        help="folder containing config.json")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--fem", choices=("scipy", "jax"), default="scipy",
                        help="FEM solve path: host float64 or accelerator CG")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU jax backend for the decoder "
                             "grid evals (keeps the run independent of the "
                             "TPU tunnel; pair with --fem scipy)")
    parser.add_argument("--resume", action="store_true",
                        help="continue from mma_state.npz + results.json "
                             "(same trajectory, asymptote history intact)")
    args = parser.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    configure_logging(args.optimization_folder, debug=args.debug)
    opt = struct_optimization(args.optimization_folder, fem_method=args.fem,
                              resume=args.resume)
    opt.run_optimization()
