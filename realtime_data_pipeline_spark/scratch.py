"""Process-scoped scratch directories for query-internal materialization.

Several registry queries materialize intermediate state on local disk —
stream replay dirs, JSONL/CSV round-trip exports, IVF index builds,
z-order rewrites, upsert-table versions.  They cannot delete that state
inline: the returned DataFrame reads it back lazily, so the files must
outlive the query function.  Deferring removal to interpreter exit
keeps every harness run (parity sweeps, NULL/hostile/empty replays,
bench loops) from accumulating export directories in /tmp
(ADVICE r6 #3).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_CREATED: list[str] = []


def scratch_dir(prefix: str) -> str:
    """``tempfile.mkdtemp`` registered for removal at process exit."""
    d = tempfile.mkdtemp(prefix=prefix)
    _CREATED.append(d)
    return d


@atexit.register
def _cleanup() -> None:
    for d in _CREATED:
        shutil.rmtree(d, ignore_errors=True)
    _CREATED.clear()
