"""Convert the official METEOR paraphrase table for the native scorer.

The METEOR 1.5 distribution ships ``data/paraphrase-en.gz`` (not
redistributable here — zero-egress build; provenance
http://www.cs.cmu.edu/~alavie/METEOR/).  A user who has the file converts
it once:

    python scripts/convert_meteor_paraphrase.py paraphrase-en.gz \
        out.gz [--min-weight 0.0] [--max-span 4]

and points ``OPENVIIC_METEOR_PARAPHRASE`` at the output; the paraphrase
stage of ``evaluation/meteor15.py`` (and the native C++ scorer) then runs
— the full 4-stage jar parameterisation (reference
evaluation/meteor/meteor.py:26-65 runs the jar with this table).

Input tolerance: lines ``phrase ||| paraphrase`` or
``phrase ||| paraphrase ||| weight`` (extra fields ignored), comments
(#) and malformed lines skipped.  Identity pairs are dropped;
``--max-span`` (default 4, the matcher's span cap) drops phrases the
aligner could never use; ``--min-weight`` filters low-probability pairs
when a weight field exists.
"""

from __future__ import annotations

import argparse
import gzip
import sys


def _open(path: str, mode: str):
    return gzip.open(path, mode, encoding="utf-8", errors="replace") \
        if path.endswith(".gz") else open(path, mode, encoding="utf-8",
                                          errors="replace")


def convert(src: str, dst: str, min_weight: float = 0.0,
            max_span: int = 4) -> dict:
    kept = dropped_weight = dropped_span = dropped_bad = dropped_id = 0
    seen = set()
    with _open(src, "rt") as fin, _open(dst, "wt") as fout:
        for line in fin:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = [p.strip() for p in line.split("|||")]
            if len(parts) < 2 or not parts[0] or not parts[1]:
                dropped_bad += 1
                continue
            a, b = parts[0], parts[1]
            if a == b:
                dropped_id += 1
                continue
            if len(parts) >= 3:
                try:
                    if float(parts[2]) < min_weight:
                        dropped_weight += 1
                        continue
                except ValueError:
                    pass  # third field not a weight — keep the pair
            if len(a.split()) > max_span or len(b.split()) > max_span:
                dropped_span += 1
                continue
            key = (a, b)
            if key in seen:
                continue
            seen.add(key)
            fout.write(f"{a} ||| {b}\n")
            kept += 1
    return {
        "kept": kept, "dropped_weight": dropped_weight,
        "dropped_span": dropped_span, "dropped_bad": dropped_bad,
        "dropped_identity": dropped_id,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("src", help="official paraphrase-en.gz (or .txt)")
    ap.add_argument("dst", help="output table (.gz or .txt)")
    ap.add_argument("--min-weight", type=float, default=0.0)
    ap.add_argument("--max-span", type=int, default=4)
    args = ap.parse_args()
    stats = convert(args.src, args.dst, args.min_weight, args.max_span)
    print(
        f"wrote {stats['kept']} pairs to {args.dst} "
        f"(dropped: {stats['dropped_weight']} below weight, "
        f"{stats['dropped_span']} over span, "
        f"{stats['dropped_identity']} identity, "
        f"{stats['dropped_bad']} malformed)", file=sys.stderr,
    )


if __name__ == "__main__":
    main()
