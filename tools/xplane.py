"""Minimal self-contained XSpace (.xplane.pb) parser.

The tensorboard_plugin_profile converter in this image is unusable (its
generated protos predate protobuf 4, and the pywrap fallback is missing
xspace_to_tools_data), so this decodes the protobuf wire format directly —
just enough structure to aggregate per-HLO-op device self time:

  XSpace.planes[].lines[].events[] (duration_ps, metadata_id)
  XPlane.event_metadata{id -> name}

Usage:
    from xplane import op_self_times
    rows = op_self_times('/tmp/trace')   # [(op_name, total_ms, count), ...]
"""

from __future__ import annotations

import glob
import os
from collections import defaultdict
from typing import Dict, Iterator, List, Tuple


def _varint(buf: bytes, i: int) -> Tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, bytes]]:
    """Yield (field_number, wire_type, payload) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:  # varint
            v, i = _varint(buf, i)
            yield field, wt, v
        elif wt == 1:  # 64-bit
            yield field, wt, buf[i:i + 8]
            i += 8
        elif wt == 2:  # length-delimited
            ln, i = _varint(buf, i)
            yield field, wt, buf[i:i + ln]
            i += ln
        elif wt == 5:  # 32-bit
            yield field, wt, buf[i:i + 4]
            i += 4
        else:
            raise ValueError('unsupported wire type %d' % wt)


def _plane_event_times(plane: bytes) -> Tuple[str, Dict[str, List[float]]]:
    """-> (plane_name, {op_name: [durations_ms...]}) summed over lines."""
    name = ''
    meta: Dict[int, str] = {}
    lines: List[bytes] = []
    for field, wt, val in _fields(plane):
        if field == 2 and wt == 2:
            name = val.decode('utf-8', 'replace')
        elif field == 3 and wt == 2:
            lines.append(val)
        elif field == 4 and wt == 2:
            # map entry { int64 key = 1; XEventMetadata value = 2; }
            mid, mname = 0, ''
            for f2, w2, v2 in _fields(val):
                if f2 == 1 and w2 == 0:
                    mid = v2
                elif f2 == 2 and w2 == 2:
                    for f3, w3, v3 in _fields(v2):
                        if f3 == 2 and w3 == 2:
                            mname = v3.decode('utf-8', 'replace')
            meta[mid] = mname
    times: Dict[str, List[float]] = defaultdict(list)
    for line in lines:
        line_name = ''
        events = []
        for field, wt, val in _fields(line):
            if field == 2 and wt == 2:
                line_name = val.decode('utf-8', 'replace')
            elif field == 4 and wt == 2:  # XEvent
                events.append(val)
        # op-level breakdown lives on the 'XLA Ops' line; step/module lines
        # would double-count
        if line_name and line_name not in ('XLA Ops',):
            continue
        for val in events:
            mid = 0
            dur_ps = 0
            for f2, w2, v2 in _fields(val):
                if f2 == 1 and w2 == 0:
                    mid = v2
                elif f2 == 3 and w2 == 0:
                    dur_ps = v2
            times[meta.get(mid, '?%d' % mid)].append(dur_ps / 1e9)
    return name, times


def newest_xplane(logdir: str) -> str:
    xs = glob.glob(os.path.join(logdir, '**', '*.xplane.pb'), recursive=True)
    assert xs, 'no xplane captured under %s' % logdir
    return max(xs, key=os.path.getmtime)


def op_self_times(logdir: str, device_substr: str = 'TPU'
                  ) -> List[Tuple[str, float, int]]:
    """Aggregate device-plane op times from the newest trace in logdir.

    Returns [(op_name, total_ms, count)] sorted by total time descending.
    Planes whose name contains ``device_substr`` count; the 'Steps'/'XLA
    Modules' summary lines are skipped by dropping module-level names.
    """
    with open(newest_xplane(logdir), 'rb') as f:
        space = f.read()
    agg: Dict[str, List[float]] = defaultdict(list)
    for field, wt, plane in _fields(space):
        if field != 1 or wt != 2:
            continue
        name, times = _plane_event_times(plane)
        if device_substr not in name:
            continue
        for op, ds in times.items():
            # metadata text is the full HLO ('%fusion.3 = bf16[...] ...');
            # keep instruction name + result shape as the display key
            key = op.lstrip('%')
            eq = key.find(' = ')
            if eq != -1:
                rhs = key[eq + 3:]
                key = key[:eq] + '  ' + rhs.split(' ')[0][:48]
            agg[key].extend(ds)
    rows = [(op, sum(ds), len(ds)) for op, ds in agg.items()]
    rows.sort(key=lambda r: -r[1])
    return rows
