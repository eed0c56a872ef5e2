"""Summarize a training workdir's TensorBoard scalars into a markdown table.

Reads the event files written by skyhdr.train.metrics.EventWriter (TFRecord
framing of TB Event protos; decoded here with the same hand-rolled wire
parser style as skyhdr/data/records.py — no TensorFlow needed) and prints,
per stage (SUN / SKY) and split (train / val), the loss trajectory at a few
checkpoints plus the final epoch. Used to assemble the quality-evidence
section of BASELINE.md from tools/quality_run.sh output.

Usage:
  python tools/quality_report.py /tmp/qrun/f32 [/tmp/qrun/bf16 ...]
"""

from __future__ import annotations

import glob
import os
import struct
import sys
from collections import defaultdict


def _read_varint(buf: bytes, off: int):
    result = shift = 0
    while True:
        b = buf[off]
        off += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, off
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a proto message."""
    off = 0
    while off < len(buf):
        key, off = _read_varint(buf, off)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, off = _read_varint(buf, off)
        elif wire == 1:
            val = buf[off:off + 8]
            off += 8
        elif wire == 2:
            ln, off = _read_varint(buf, off)
            val = buf[off:off + ln]
            off += ln
        elif wire == 5:
            val = buf[off:off + 4]
            off += 4
        else:  # pragma: no cover - not produced by our writer
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def read_events(path: str):
    """[(step, tag, value)] from one TB event file."""
    data = open(path, "rb").read()
    out = []
    off = 0
    while off + 12 <= len(data):
        (ln,) = struct.unpack("<Q", data[off:off + 8])
        off += 12  # length + masked crc of length
        payload = data[off:off + ln]
        off += ln + 4  # payload + masked crc of payload
        step, summary = 0, None
        for field, _, val in _fields(payload):
            if field == 2:
                step = val
            elif field == 5:
                summary = val
        if summary is None:
            continue
        for field, _, sval in _fields(summary):
            if field != 1:
                continue
            tag, value = None, None
            for f2, _, v2 in _fields(sval):
                if f2 == 1:
                    tag = v2.decode()
                elif f2 == 2:
                    (value,) = struct.unpack("<f", v2)
            if tag is not None and value is not None:
                out.append((step, tag, value))
    return out


def load_workdir(workdir: str):
    """{(stage, split): {tag: {step: value}}} over every event file under
    workdir/tensorboard/<stage>/<timestamp>/<split>/ (later files win)."""
    curves = defaultdict(lambda: defaultdict(dict))
    pattern = os.path.join(workdir, "tensorboard", "*", "*", "*", "events*")
    for path in sorted(glob.glob(pattern)):
        parts = path.split(os.sep)
        stage, split = parts[-4], parts[-2]
        for step, tag, value in read_events(path):
            curves[(stage, split)][tag][step] = value
    return curves


def _fmt(v: float) -> str:
    return f"{v:.4g}"


def report(workdir: str, n_points: int = 5) -> str:
    curves = load_workdir(workdir)
    lines = [f"## {workdir}", ""]
    for (stage, split) in sorted(curves):
        tags = curves[(stage, split)]
        steps = sorted({s for c in tags.values() for s in c})
        if not steps:
            continue
        idx = sorted({steps[0], steps[-1],
                      *steps[:: max(1, len(steps) // (n_points - 1))]})
        names = sorted(tags)
        lines.append(f"### {stage} / {split} (epochs 1..{steps[-1]})")
        lines.append("| epoch | " + " | ".join(names) + " |")
        lines.append("|" + "---|" * (len(names) + 1))
        for s in idx:
            row = [str(s)] + [
                _fmt(tags[t][s]) if s in tags[t] else "" for t in names
            ]
            lines.append("| " + " | ".join(row) + " |")
        lines.append("")
    return "\n".join(lines)


def main():
    workdirs = sys.argv[1:] or ["/tmp/qrun/f32"]
    for wd in workdirs:
        print(report(wd))


if __name__ == "__main__":
    main()
