"""Metrics / logging.

Structured-output parity with the reference (SURVEY.md §5): per-comparison
``statistics.json`` (compare.harness), training reports (fb.trainer),
timestamped UTF-8 text summaries (compare.experiment) — plus what the
reference lacked in one place: a JSONL run logger and a CSV writer for the
episode-analytics table (``agent_analysis.csv``,
RL/train_raytracer_improved.py:423-429).
"""
from __future__ import annotations

import csv
import json
import time
from pathlib import Path
from typing import Mapping, Sequence


class RunLogger:
    """Append-only JSONL metrics stream (one dict per step/event)."""

    def __init__(self, path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._f = open(self.path, "a", encoding="utf-8")

    def log(self, step: int, **metrics):
        rec = {"step": step, "time": time.time(), **metrics}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


def write_csv(path, rows: Sequence[Mapping]):
    """agent_analysis.csv-style table writer."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if not rows:
        path.write_text("")
        return
    keys = list(rows[0].keys())
    with open(path, "w", newline="", encoding="utf-8") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        for r in rows:
            w.writerow(r)


def episode_analytics(env_scene, rewards, bounces, hit_ids,
                      terminations) -> list[dict]:
    """Behavior-analytics rows (hit frequency by object id, success by
    bounce count, termination reasons — RL/train_raytracer_improved.py:
    113-205)."""
    rows = []
    for i, (r, b, h, t) in enumerate(zip(rewards, bounces, hit_ids,
                                         terminations)):
        rows.append({"episode": i, "reward": float(r), "bounces": int(b),
                     "final_object_id": int(h), "termination": str(t)})
    return rows
