"""Engine fingerprint: a content hash of the code that determines encoded
bytes and read semantics.

Snapshots record it at commit time so any cached-store reuse can check
"was this store written by the code currently loaded?" instead of a
hand-maintained version tag (the r4 hazard: a codec change without a tag
bump silently serves stale bytes to the correctness gate). The hash covers
the codec layer, the selector, and the encode/decode operators — the
modules whose edits can change what lands on disk or how it reads back.
"""

from __future__ import annotations

import hashlib
import os

_FINGERPRINT: str | None = None

# modules (relative to the package root) whose source bytes define the
# on-disk format and its interpretation
_SURFACE = (
    "codecs",          # whole directory
    "selector.py",
    "operators/encode.py",
    "operators/decode.py",
    "plans/snapshot.py",
    "schema.py",
)


def engine_fingerprint() -> str:
    """Stable 16-hex digest of the encode/decode-relevant source files.

    Computed once per process; file order is fixed (sorted relative
    paths) so the digest is deterministic across machines."""
    global _FINGERPRINT
    if _FINGERPRINT is not None:
        return _FINGERPRINT
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    paths: list[str] = []
    for entry in _SURFACE:
        full = os.path.join(pkg_root, entry)
        if os.path.isdir(full):
            for dirpath, _dirs, files in os.walk(full):
                paths.extend(os.path.join(dirpath, f)
                             for f in files if f.endswith(".py"))
        elif os.path.exists(full):
            paths.append(full)
    h = hashlib.sha256()
    if paths:
        for p in sorted(paths):
            rel = os.path.relpath(p, pkg_root)
            h.update(rel.encode())
            with open(p, "rb") as f:
                h.update(f.read())
    else:
        # zipimport (--py-files): the package dir is inside an archive,
        # so walk/open see nothing — hash module SOURCES via the import
        # loaders instead (zipimporter implements get_source)
        import importlib.util
        pkg = __name__.rsplit(".", 1)[0]
        mods = ["codecs", "codecs.alp", "codecs.base", "codecs.dictionary",
                "codecs.fsst", "codecs.intcodecs", "codecs.listarr",
                "codecs.plain", "selector", "operators.encode",
                "operators.decode", "plans.snapshot", "schema"]
        for m in mods:
            try:
                spec = importlib.util.find_spec(f"{pkg}.{m}")
                src = spec.loader.get_source(spec.name)  # type: ignore
            except Exception:
                continue
            if src:
                h.update(m.encode())
                h.update(src.encode())
    _FINGERPRINT = h.hexdigest()[:16]
    return _FINGERPRINT
