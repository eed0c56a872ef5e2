"""Mean metric accumulators + TensorBoard scalar event writer.

  * MeanMetrics  — the tf.keras.metrics.Mean bank the reference resets per
    epoch and reports per loss term (train.py:183-199, 448-472).
  * EventWriter  — a TensorBoard-compatible scalar writer built on this
    framework's own TFRecord framing (TB event files ARE TFRecord streams of
    Event protos); no TensorFlow needed, readable by stock TensorBoard.
    Replaces tf.summary.create_file_writer (tf_utils.py:282-292).
"""

from __future__ import annotations

import os
import socket
import struct
import time
from typing import Dict

from skyhdr.data.records import _frame_record, _len_delim, _tag, _varint


class MeanMetrics:
    """Per-key running means, reset per epoch.

    update() is LAZY: device scalars are appended without conversion so the
    step loop never blocks on a device->host transfer (on the tunneled TPU a
    per-step float() costs a full relay round-trip — it serialized training
    at ~1 s/step before this). result() fetches everything in one
    device_get.
    """

    def __init__(self):
        self._vals: Dict[str, list] = {}

    def update(self, values: Dict[str, float]) -> None:
        for k, v in values.items():
            self._vals.setdefault(k, []).append(v)

    def result(self) -> Dict[str, float]:
        import jax
        import numpy as np

        host = jax.device_get(self._vals)
        # Entries may be scalars (per-step updates) or [n]-vectors (one
        # update per scanned dispatch chunk, TrainLoop._flush_chunk); each
        # element is one step, weighted equally.
        return {
            k: float(np.mean(np.concatenate(
                [np.atleast_1d(np.asarray(v, dtype=np.float64)) for v in vs])))
            for k, vs in host.items() if vs
        }

    def reset(self) -> None:
        self._vals.clear()


def _encode_event(wall_time: float, step: int, tag: str = None,
                  value: float = None, file_version: str = None) -> bytes:
    """Event proto: wall_time(double,1), step(int64,2),
    file_version(string,3) | summary(Summary,5) with
    Summary.value {tag(string,1), simple_value(float,2)}."""
    out = bytearray()
    out += _tag(1, 1) + struct.pack("<d", wall_time)
    if step:
        out += _tag(2, 0) + _varint(step)
    if file_version is not None:
        out += _len_delim(3, file_version.encode())
    if tag is not None:
        sval = _len_delim(1, tag.encode()) + _tag(2, 5) + struct.pack("<f", value)
        summary = _len_delim(1, sval)
        out += _len_delim(5, summary)
    return bytes(out)


class EventWriter:
    """Append-only TensorBoard scalar event file."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        fname = "events.out.tfevents.{:d}.{}.v2".format(
            int(time.time()), socket.gethostname()
        )
        self._path = os.path.join(logdir, fname)
        self._f = open(self._path, "ab")
        self._f.write(_frame_record(
            _encode_event(time.time(), 0, file_version="brain.Event:2")
        ))
        self._f.flush()

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._f.write(_frame_record(
            _encode_event(time.time(), step, tag=tag, value=float(value))
        ))

    def scalars(self, values: Dict[str, float], step: int) -> None:
        for k, v in values.items():
            self.scalar(k, v, step)
        self.flush()

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        self._f.close()
