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
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_BASE = os.path.join(_REPO, ".scratch")


def _source_fingerprint(norm_dir: str) -> str:
    """Digest of (name, size, mtime_ns) for the dir's parquet files.

    The driver REGENERATES testdata between rounds (same paths, new bytes);
    reuse-aware fixtures (_SUCCESS short-circuits in scans.py / streaming)
    keyed on the path alone would replay the previous round's data against
    oracles reading the fresh files.  Folding the source files' stat
    identity into the tag makes any regen land in a fresh directory — no
    manual `rm -rf .scratch` step, no stale replays.  Computed on EVERY
    call (~10 os.stat, microseconds) — caching it would pin a pre-regen
    tag for the process lifetime, recreating the staleness it removes."""
    h = hashlib.sha1(norm_dir.encode())
    try:
        names = sorted(os.listdir(norm_dir))
    except OSError:
        return h.hexdigest()[:8]  # nonexistent dir: pure-path tag
    for name in names:
        if not name.endswith(".parquet"):
            continue
        try:
            st = os.stat(os.path.join(norm_dir, name))
        except OSError as exc:
            # a file vanishing mid-scan (regen racing this run) must be
            # VISIBLE — a silent partial digest would mint a transient tag
            # whose fixtures no later run ever finds
            print(f"[engine] WARNING: fingerprint skipping {name}: {exc}",
                  file=sys.stderr)
            continue
        h.update(f"{name}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:8]


def schedule_tag(*parts: object) -> str:
    """Short content hash of a fixture's schedule constants.

    Reuse-aware fixtures (j05/j11/j12 arrival replays) skip regeneration
    when the expected files exist, so fixture identity must track the
    CONTRACT, not a hand-bumped version suffix — editing a schedule
    constant without bumping the leaf would silently replay a stale
    fixture against a new oracle (ADVICE r15).  Folding the constants'
    repr into the leaf name makes any schedule edit land in a fresh
    directory automatically, exactly like `_source_fingerprint` does for
    source-data regeneration."""
    return hashlib.sha1(repr(parts).encode()).hexdigest()[:8]


def scratch_dir(query_id: str, sf_dir: str, leaf: str = "") -> str:
    # tag = basename + short hash of (full path + source file identity):
    # two data directories sharing a leaf name must not collide, and a
    # regenerated directory must not be mistaken for its previous contents
    # — either way a reuse-aware query (j05) would replay stale fixtures
    norm = os.path.normpath(os.path.abspath(sf_dir))
    sf_tag = os.path.basename(norm) + "-" + _source_fingerprint(norm)
    d = os.path.join(_BASE, query_id, sf_tag, leaf) if leaf else os.path.join(
        _BASE, query_id, sf_tag)
    os.makedirs(d if not leaf else os.path.dirname(d), exist_ok=True)
    return d
