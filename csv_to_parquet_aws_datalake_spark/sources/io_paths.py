"""Scratch locations for source/sink roundtrip queries.

All scratch output lives INSIDE the repo under ``.scratch/`` (gitignored):
the build environment forbids writing outside the repo tree.  Each
(query, scale-factor) pair gets a stable directory; writers use
mode("overwrite") so reruns are idempotent.  The returned DataFrames stay
lazy, so outputs must persist until the driver collects — no cleanup on
return.
"""

from __future__ import annotations

import hashlib
import os

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_BASE = os.path.join(_REPO, ".scratch")


def scratch_dir(query_id: str, sf_dir: str, leaf: str = "") -> str:
    # tag = basename + short hash of the FULL path: two data directories
    # sharing a leaf name (e.g. /a/sf0.01 vs /b/sf0.01) must not collide,
    # or reuse-aware queries (j05) would replay stale fixtures
    norm = os.path.normpath(os.path.abspath(sf_dir))
    sf_tag = (os.path.basename(norm) + "-"
              + hashlib.sha1(norm.encode()).hexdigest()[:8])
    d = os.path.join(_BASE, query_id, sf_tag, leaf) if leaf else os.path.join(
        _BASE, query_id, sf_tag)
    os.makedirs(d if not leaf else os.path.dirname(d), exist_ok=True)
    return d
