"""Summarise a JAX xplane.pb trace: top TPU ops by total duration.

No tensorflow/tensorboard schema needed — decodes the protobuf wire
format generically (XSpace/XPlane/XLine/XEvent field numbers only).

Usage: python scripts/xplane_top.py /tmp/xtrace [N]
"""

from __future__ import annotations

import collections
import glob
import sys


def read_varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def fields(buf):
    i = 0
    n = len(buf)
    while i < n:
        tag, i = read_varint(buf, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = read_varint(buf, i)
        elif wt == 2:
            ln, i = read_varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = buf[i : i + 4]
            i += 4
        elif wt == 1:
            v = buf[i : i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def summarize(path: str, top_n: int = 30):
    data = open(path, "rb").read()
    for _, _, plane in (f for f in fields(data) if f[0] == 1):
        name = None
        lines = []
        evmeta = {}
        for f2, _, v2 in fields(plane):
            if f2 == 2:
                name = v2.decode()
            elif f2 == 3:
                lines.append(v2)
            elif f2 == 4:
                k = nm = None
                for f3, _, v3 in fields(v2):
                    if f3 == 1:
                        k = v3
                    elif f3 == 2:
                        for f4, _, v4 in fields(v3):
                            if f4 == 2:
                                nm = v4.decode()
                if k is not None:
                    evmeta[k] = nm
        if not name or not name.startswith("/device:TPU"):
            continue
        totals = collections.Counter()
        counts = collections.Counter()
        line_total = {}
        for line in lines:
            lname = None
            levents_dur = 0
            for f2, wt2, v2 in fields(line):
                if f2 == 2 and wt2 == 2:
                    lname = v2.decode()
                elif f2 == 4 and wt2 == 2:  # XLine.events
                    mid = dur = 0
                    for f3, _, v3 in fields(v2):
                        if f3 == 1:
                            mid = v3
                        elif f3 == 3:
                            dur = v3
                    op = evmeta.get(mid, str(mid))
                    totals[(lname, op)] += dur
                    counts[(lname, op)] += 1
                    levents_dur += dur
            line_total[lname] = levents_dur / 1e9
        print(f"== plane {name}")
        for ln, ms in line_total.items():
            print(f"   line {ln}: {ms:.2f} ms total")
        print(f"   {'total_ms':>9} {'count':>7}  line :: op")
        for key, dur in totals.most_common(top_n):
            lname, op = key
            print(f"   {dur / 1e9:9.3f} {counts[key]:7d}  {lname} :: {op[:100]}")


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xtrace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    paths = glob.glob(f"{root}/**/*.xplane.pb", recursive=True)
    summarize(sorted(paths)[-1], top_n)
