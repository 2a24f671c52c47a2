"""Minimal XSpace (xplane.pb) reader for jax.profiler traces.

Decodes the protobuf wire format directly (no tensorflow dependency) and
prints, for the TPU device plane's XLA-op lines:
  - per-op-name total / mean duration, sorted,
  - interval-union "busy" time overall and split compute vs copy/slice,
so the un-overlapped DMA share of a step is measurable (PERF.md round-5
"DMA wall" methodology).

Usage: python xplane_stats.py /tmp/trace_dir [--steps N] [--top K]
"""
import argparse
import collections
import glob
import gzip
import os
import struct
import sys


def _varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _fields(buf):
    """Yield (field_no, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f'wire type {wt}')
        yield fno, wt, v


def parse_xspace(raw):
    planes = []
    for fno, _, v in _fields(raw):
        if fno == 1:
            planes.append(parse_plane(v))
    return planes


def parse_plane(buf):
    name = ''
    lines = []
    emeta = {}
    for fno, _, v in _fields(buf):
        if fno == 2:
            name = v.decode()
        elif fno == 3:
            lines.append(v)
        elif fno == 4:  # map<int64, XEventMetadata>
            k = mname = None
            for f2, _, v2 in _fields(v):
                if f2 == 1:
                    k = v2
                elif f2 == 2:
                    for f3, _, v3 in _fields(v2):
                        if f3 == 2:
                            mname = v3.decode()
            if k is not None:
                emeta[k] = mname or ''
    out_lines = []
    for lb in lines:
        lname = ''
        ts_ns = 0
        events = []
        for fno, wt, v in _fields(lb):
            if fno == 2:
                lname = v.decode()
            elif fno == 11 and wt == 2:
                lname = v.decode() or lname
            elif fno == 3:
                ts_ns = v
            elif fno == 4:
                mid = off = dur = 0
                for f2, _, v2 in _fields(v):
                    if f2 == 1:
                        mid = v2
                    elif f2 == 2:
                        off = v2
                    elif f2 == 3:
                        dur = v2
                events.append((mid, off, dur))
        out_lines.append((lname, ts_ns, events))
    return name, out_lines, emeta


def union_ps(intervals):
    if not intervals:
        return 0
    intervals.sort()
    tot = 0
    cs, ce = intervals[0]
    for s, e in intervals[1:]:
        if s > ce:
            tot += ce - cs
            cs, ce = s, e
        else:
            ce = max(ce, e)
    return tot + (ce - cs)


COPY_MARKERS = ('copy', 'slice', 'dynamic-update-slice', 'concatenate',
                'transpose', 'bitcast', 'dynamic-slice')


def opcode_of(name):
    """Classify by the LHS instruction name ('%copy-start.3 = ...').
    Custom-renamed instructions (e.g. %rpn_conv.29) classify as compute,
    which is what we want."""
    lhs = name.split(' = ', 1)[0].strip().lstrip('%')
    return lhs.split('.')[0]


def is_copyish(name):
    op = opcode_of(name).lower()
    return any(op.startswith(m) for m in COPY_MARKERS)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('trace_dir')
    ap.add_argument('--top', type=int, default=25)
    ap.add_argument('--steps', type=int, default=5,
                    help='traced step count (durations divided by this)')
    ap.add_argument('--line', default='XLA Ops',
                    help='substring of the trace line name to analyze')
    args = ap.parse_args()

    pbs = sorted(glob.glob(os.path.join(
        args.trace_dir, '**', '*.xplane.pb'), recursive=True),
        key=os.path.getmtime)
    if not pbs:
        sys.exit(f'no xplane.pb under {args.trace_dir}')
    raw = open(pbs[-1], 'rb').read()
    planes = parse_xspace(raw)

    for pname, lines, emeta in planes:
        if 'TPU' not in pname and 'tpu' not in pname.lower():
            continue
        for lname, _, events in lines:
            if args.line.lower() not in lname.lower() or not events:
                continue
            per_op = collections.defaultdict(lambda: [0, 0])
            all_iv, copy_iv, comp_iv = [], [], []
            for mid, off, dur in events:
                nm = emeta.get(mid, str(mid))
                per_op[nm][0] += dur
                per_op[nm][1] += 1
                iv = (off, off + dur)
                all_iv.append(iv)
                (copy_iv if is_copyish(nm) else comp_iv).append(iv)
            k = args.steps
            print(f'== plane "{pname}" line "{lname}": '
                  f'{len(all_iv)} events / {k} steps')
            print(f'  busy union      : {union_ps(all_iv)/1e9/k:8.3f} ms/step')
            print(f'  compute union   : {union_ps(comp_iv)/1e9/k:8.3f} ms/step')
            print(f'  copyish union   : {union_ps(copy_iv)/1e9/k:8.3f} ms/step')
            top = sorted(per_op.items(), key=lambda kv: -kv[1][0])
            print(f'  top {args.top} ops by total time:')
            for nm, (tot, cnt) in top[:args.top]:
                tag = 'COPY' if is_copyish(nm) else '    '
                print(f'   {tag} {tot/1e9/k:8.3f} ms/step  x{cnt:<4d} {nm[:110]}')


if __name__ == '__main__':
    main()
