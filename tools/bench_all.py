"""Run every bench mode in ONE process (one tunnel handshake) and append
the JSON lines to stdout.  Dev tool for round bookkeeping; the driver's
official number is still a plain `python bench.py` run.

Usage: python tools/bench_all.py [--quick]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def run(argv):
    sys.argv = ["bench.py"] + argv
    print(f"### bench {' '.join(argv)}", flush=True)
    try:
        bench.main()
    except SystemExit:
        pass


def main():
    quick = "--quick" in sys.argv[1:]
    it = ["--iters", "60"] if quick else []
    run([] + it)                                   # two_stage 640 b16
    run(["--input", "720p"] + it)
    run(["--vit", "b8"] + (["--iters", "40"] if quick else []))
    run(["--dense"] + it)
    run(["--mode", "detect"] + it)
    run(["--mode", "classify"] + it)
    run(["--mode", "train"] + (["--iters", "60"] if quick else []))
    run(["--mode", "serve", "--iters", "50"])
    run(["--mode", "serve", "--iters", "50", "--dense"])


if __name__ == "__main__":
    main()
