"""Scratch locations for source/sink roundtrip queries.

Each (query, scale-factor) pair gets a stable directory under the system
temp dir; writers use mode("overwrite") so reruns are idempotent.  The
returned DataFrames stay lazy, so outputs must persist until the driver
collects — no cleanup on return.
"""

from __future__ import annotations

import os
import tempfile

_BASE = os.path.join(tempfile.gettempdir(), "spark_graft_io")


def scratch_dir(query_id: str, sf_dir: str, leaf: str = "") -> str:
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    d = os.path.join(_BASE, query_id, sf_tag, leaf) if leaf else os.path.join(
        _BASE, query_id, sf_tag)
    os.makedirs(os.path.dirname(d) if leaf else d, exist_ok=True)
    return d
