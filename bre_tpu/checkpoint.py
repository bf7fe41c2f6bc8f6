"""Checkpoint / resume for progressive renders.

Reference behavior (SURVEY section 5): the fork supports iteration-range
resume — ``startiteration``/``enditeration`` params with the radius schedule
fast-forwarded on resume (photonbeam.cpp:354-357, 594-595) and periodic film
writes every ``imagewritefrequency`` iterations (:565-584).  The rebuild makes
the implicit state explicit: a checkpoint is ``(iter, radius, Ld buffer)``
saved as arrays — loadable to continue exactly where a run stopped.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np


def save_checkpoint(path, iteration: int, radius: float, buffers: dict) -> None:
    """Save progressive state: buffers is a dict of arrays (e.g. Ld, tau, N,
    radii for vsppm).  Written atomically (tmp + rename)."""
    path = Path(path)
    tmp = path.with_suffix(".tmp.npz")
    np.savez(
        tmp,
        __meta__=json.dumps({"iteration": iteration, "radius": radius}),
        **{k: np.asarray(v) for k, v in buffers.items()},
    )
    tmp.rename(path)


def load_checkpoint(path) -> Optional[dict]:
    """Returns {"iteration", "radius", "buffers"} or None if absent."""
    path = Path(path)
    if not path.exists():
        return None
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    buffers = {k: data[k] for k in data.files if k != "__meta__"}
    return {"iteration": meta["iteration"], "radius": meta["radius"], "buffers": buffers}
