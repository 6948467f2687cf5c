"""Bag recording + deterministic replay over the message bus.

The ROS ecosystem's debugging workhorse is ``rosbag``: record every topic of
a live run, replay it later against new code. The reference has nothing of
the sort — its only forensic artifacts are stale debug PNGs
(ros2_mpc/scripts/map.png etc., SURVEY.md §5 "checkpoint/resume: none").
Here the bus (nodes/bus.py) is versioned, so a bag preserves the exact
(topic, sequence, payload) stream and a replay reproduces consumer behavior
bit-for-bit: record a failing field run once, then step any node through the
identical inputs on a workstation.

* :class:`BagRecorder` — wildcard ``bus.tap`` observer; records every
  publish (optionally filtered to a topic set) with a monotonic timestamp.
  Payloads are deep-copied at record time, so later in-place mutation by the
  publisher cannot corrupt the bag.
* :func:`save_bag` / :func:`load_bag` — pickle container (messages are the
  plain dataclasses of nodes/bus.py + numpy arrays; same-version replay is
  the contract, like rosbag's).
* :func:`replay` — republish records in order onto any bus (optionally
  topic-filtered and/or time-paced).
"""

from __future__ import annotations

import copy
import dataclasses
import pickle
import time
from typing import Any, Iterable, Optional

from .bus import MessageBus


@dataclasses.dataclass
class BagRecord:
    t: float  # monotonic capture time [s]
    topic: str
    seq: int  # source-bus sequence number at capture
    msg: Any


class BagRecorder:
    """Attach with ``BagRecorder(bus)``; detach with ``stop()``."""

    def __init__(self, bus: MessageBus, topics: Optional[Iterable[str]] = None,
                 clock=time.monotonic):
        self._bus = bus
        self._topics = set(topics) if topics is not None else None
        self._clock = clock
        self.records: list[BagRecord] = []
        bus.tap(self._on_publish)

    def _on_publish(self, topic: str, msg: Any, seq: int):
        if self._topics is not None and topic not in self._topics:
            return
        self.records.append(BagRecord(self._clock(), topic, seq, copy.deepcopy(msg)))

    def stop(self) -> list[BagRecord]:
        self._bus.untap(self._on_publish)
        return self.records


def save_bag(path: str, records: list[BagRecord]):
    with open(path, "wb") as f:
        pickle.dump({"format": "tpu-mpc-bag-v1", "records": records}, f)


def load_bag(path: str) -> list[BagRecord]:
    with open(path, "rb") as f:
        data = pickle.load(f)
    if data.get("format") != "tpu-mpc-bag-v1":
        raise ValueError(f"not a tpu-mpc bag: {path}")
    return data["records"]


def replay(
    bus: MessageBus,
    records: list[BagRecord],
    topics: Optional[Iterable[str]] = None,
    realtime: bool = False,
    on_record=None,
) -> int:
    """Republish ``records`` in capture order onto ``bus``.

    ``topics`` filters what is replayed (e.g. sensors only, so live nodes
    recompute their outputs from recorded inputs). ``realtime=True`` sleeps
    to reproduce the original inter-record spacing. ``on_record(rec)`` is
    called after each publish — the hook for stepping consumers in lockstep
    with the stream. Returns the number of records published.
    """
    wanted = set(topics) if topics is not None else None
    n = 0
    prev_t = None
    for rec in records:
        if wanted is not None and rec.topic not in wanted:
            continue
        if realtime and prev_t is not None:
            time.sleep(max(0.0, rec.t - prev_t))
        prev_t = rec.t
        bus.publish(rec.topic, copy.deepcopy(rec.msg))
        if on_record is not None:
            on_record(rec)
        n += 1
    return n
