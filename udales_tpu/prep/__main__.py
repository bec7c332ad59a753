"""CLI: regenerate a case's preprocessed inputs from its own namoptions.

    python -m udales_tpu.prep <case_dir> [--expnr N] [--out DIR]

Equivalent of the reference's udprep entry point (tools/python/udprep):
parses the &INPS group from the case's namoptions and runs the full IBM /
radiation / vegetation / scalar preprocessing chain."""
from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(prog="udales_tpu.prep", description=__doc__)
    ap.add_argument("case_dir", help="case directory with namoptions.<expnr>")
    ap.add_argument("--expnr", default=None, help="experiment number "
                    "(default: from the first namoptions.* found)")
    ap.add_argument("--out", default=None, help="output directory "
                    "(default: the case directory itself)")
    args = ap.parse_args(argv)
    from .inps import prepare_from_case
    counts = prepare_from_case(args.case_dir, outdir=args.out,
                               expnr=args.expnr)
    print("&WALLS " + " ".join(f"{k}={v}" for k, v in counts.items()))


if __name__ == "__main__":
    main()
