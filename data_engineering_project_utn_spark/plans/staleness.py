"""Source-fingerprint staleness tracking for the query registry.

Problem (VERDICT r03): the driver checks at most 50 registry queries per
round, in ``all_queries()`` order.  A query green in an *earlier* round was
treated as verified forever — even if the module implementing it was edited
afterwards (e.g. ``llm_image_metadata`` green in r02, its module rewritten in
a later commit, never re-hashed).  Staleness must be structural, not manual.

Mechanism:

* ``impl_files(fn)`` — the set of package source files a builder function
  (transitively) depends on: BFS over module globals, following any module /
  function / class that lives inside this package.  Coarse (file-level), but
  exactly the granularity the driver cares about: "did code that could affect
  this query change?".
* ``fingerprint(fn)`` — sha256 over those files' current contents.
* ``VERIFIED.json`` (repo root) — ledger ``{query: {round, fingerprint}}``
  written by ``tools/refresh_verified.py`` from a driver CORRECTNESS file,
  hashing the files *as of the git commit the driver actually verified*.
* ``is_stale(name, fn)`` — True when the ledger has no entry or the ledger
  fingerprint differs from the current one.  ``all_queries()`` moves stale
  queries to the front of the driver's 50-query budget.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import types
from collections.abc import Callable
from functools import lru_cache

_PKG = __name__.split(".", 1)[0]
# plans/staleness.py -> package dir -> repo root
REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
LEDGER_PATH = os.path.join(REPO_ROOT, "VERIFIED.json")


def _module_closure(root_module: str) -> list[str]:
    """Transitive closure of package modules reachable from a module's
    globals (imported modules, plus home modules of imported functions
    and classes)."""
    seen = {root_module}
    frontier = [root_module]
    while frontier:
        mod = sys.modules.get(frontier.pop())
        if mod is None:
            continue
        for value in vars(mod).values():
            if isinstance(value, types.ModuleType):
                name = value.__name__
            elif isinstance(value, type) or callable(value):
                name = getattr(value, "__module__", None)
            else:
                continue
            if name and name.startswith(_PKG) and name not in seen:
                seen.add(name)
                frontier.append(name)
    return sorted(seen)


# Plumbing with no query semantics: registration/ordering (registry, this
# module) and re-export shims (__init__).  Excluded so that editing the
# staleness mechanism itself does not mark every query stale at once.
_PLUMBING = (f"{_PKG}.plans.registry", f"{_PKG}.plans.staleness")


def impl_files(fn: Callable) -> list[str]:
    """Repo-relative source files implementing ``fn`` (its module plus the
    package modules that module pulls in, transitively)."""
    files = []
    for name in _module_closure(fn.__module__):
        if name in _PLUMBING or name.rsplit(".", 1)[-1] == "__init__":
            continue
        mod = sys.modules.get(name)
        path = getattr(mod, "__file__", None)
        if path is None or os.path.basename(path) == "__init__.py":
            continue
        files.append(os.path.relpath(os.path.abspath(path), REPO_ROOT))
    return sorted(files)


# Digest/ledger caches are keyed on (path, mtime_ns, size), so an in-process
# edit (refresh_verified.py, a live-reload session) is picked up on the next
# call instead of the first call's result sticking for process lifetime
# (ADVICE r04).  A same-size same-mtime rewrite is the one undetectable case
# — sub-mtime-resolution torn writes, not a workflow that occurs here.


@lru_cache(maxsize=None)
def _digest_at(rel_path: str, mtime_ns: int, size: int) -> bytes:
    with open(os.path.join(REPO_ROOT, rel_path), "rb") as fh:
        return hashlib.sha256(fh.read()).digest()


def _file_digest(rel_path: str) -> bytes:
    st = os.stat(os.path.join(REPO_ROOT, rel_path))
    return _digest_at(rel_path, st.st_mtime_ns, st.st_size)


def fingerprint(fn: Callable) -> str:
    """Hex fingerprint of the current on-disk implementation of ``fn``."""
    h = hashlib.sha256()
    for rel in impl_files(fn):
        h.update(rel.encode())
        h.update(_file_digest(rel))
    return h.hexdigest()[:16]


@lru_cache(maxsize=4)
def _ledger_at(mtime_ns: int, size: int) -> dict:
    try:
        with open(LEDGER_PATH, encoding="utf-8") as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def _ledger() -> dict:
    try:
        st = os.stat(LEDGER_PATH)
    except OSError:
        return {}
    return _ledger_at(st.st_mtime_ns, st.st_size)


def clear_caches() -> None:
    """Drop every memoized digest/ledger entry — for tests and long-lived
    tools that bypass the mtime/size keying (e.g. restoring a file with
    identical stat signature)."""
    _digest_at.cache_clear()
    _ledger_at.cache_clear()


def is_stale(name: str, fn: Callable) -> bool:
    """True when the query has never been driver-verified, or code in its
    implementation closure changed since its last green CORRECTNESS row.

    Fails safe: if an implementation file can't be read (package deployed
    as a zip via ``--py-files``, file renamed after import), the query is
    treated as stale rather than letting hashing crash every registry
    consumer (``all_queries()`` sorts with this)."""
    entry = _ledger().get(name)
    if not entry:
        return True
    try:
        return entry.get("fingerprint") != fingerprint(fn)
    except OSError:
        return True


def last_green_round(name: str) -> int:
    """Round number of the query's last green CORRECTNESS row, -1 if never
    verified.  Orders the re-check queue when many queries are stale at
    once (e.g. a shared module changed): least-recently-verified first, so
    the driver's capped budget never starves a query that has been waiting
    since an older round."""
    entry = _ledger().get(name)
    if not entry:
        return -1
    round_name = str(entry.get("round", ""))
    digits = "".join(ch for ch in round_name if ch.isdigit())
    return int(digits) if digits else -1
